"""Measured-negative experimental kernels, kept for the record.

Nothing in this namespace is reachable from any default configuration.

Winograd F(2,3) (winograd.py, winograd_pallas.py): cuts executed MXU FLOPs
2.25x per 3x3 conv, and the Pallas-fused variant is numerically sound (19
tests) — but measured **3.3x slower end-to-end** on v5e at the flagship
256px workload (BENCH A/B, round 4), because the guided sampler is
HBM-bandwidth-bound, not FLOP-bound: the transform stages add bytes to the
dominant stream (see docs/DESIGN.md "Winograd verdict" and
RESULTS_CONV_AB.json). Revival condition: a batch-heavy operating point
where the workload becomes MXU-bound (arithmetic intensity above the v5e
ridge), e.g. large-batch training of the 64px models — re-run
scripts/bench_winograd.py there before wiring it anywhere.
"""
