#!/usr/bin/env python
"""Distribution-metric evaluation CLI: FID / KID between two image folders.

Rounds out the reference's evaluation surface (k_diffusion/evaluation.py,
used inside its training scripts) as a standalone tool. Feature backbones:
  inception  — FID InceptionV3 (needs converted weights, see
               cli/convert_weights + models/inception.py)
  clip       — transformers Flax CLIP vision tower (local weights dir)
  pixels     — resized raw pixels (backbone-free smoke metric)
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from .. import evaluation
    from ..data import FolderOfImages

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("real", help="folder of reference images")
    p.add_argument("fake", help="folder of generated images")
    p.add_argument("--backbone", default="pixels",
                   choices=["inception", "clip", "pixels"])
    p.add_argument("--weights", default=None,
                   help="backbone weights (orbax dir / .npz / HF dir)")
    p.add_argument("--size", type=int, default=64,
                   help="image size for loading (pixels backbone)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--paired", action="store_true",
                   help="paired per-image PSNR/SSIM between the two folders "
                        "(the reference's dps_utils/compute_metric.py) "
                        "instead of distribution metrics")
    p.add_argument("--lpips-weights", default=None,
                   help="converted LPIPS .npz for paired mode")
    p.add_argument("--dp", action="store_true",
                   help="shard feature extraction over a data-parallel "
                        "device mesh — the TPU-native form of the "
                        "reference's accelerate gather "
                        "(k_diffusion/evaluation.py:53-63)")
    p.add_argument("--out", default=None, help="optional JSON output path")
    args = p.parse_args(argv)

    if args.paired:
        from .. import metrics
        from ..data import FolderOfImages
        real = FolderOfImages(args.real, size=args.size)
        fake = FolderOfImages(args.fake, size=args.size)
        n = min(len(real), len(fake))
        if args.max_images:
            n = min(n, args.max_images)
        lpips_params = None
        if args.lpips_weights:
            lp = np.load(args.lpips_weights, allow_pickle=True)
            lpips_params = lp["params"].item() if "params" in lp else dict(lp)
        import jax.numpy as jnp
        results = []
        for i in range(n):
            a = jnp.asarray(real[i][0])[None]
            b = jnp.asarray(fake[i][0])[None]
            results.append(metrics.compute_metrics(b, a, lpips_params))
        out = metrics.calculate_average_metric(results)
        out["n"] = n
        print(json.dumps(out))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)
        return out

    if args.backbone == "inception":
        from ..models.inception import make_inception_extractor
        from .. import ckpt
        weights = ckpt.load_checkpoint(args.weights)
        extractor = make_inception_extractor(weights)
    elif args.backbone == "clip":
        extractor = evaluation.make_clip_extractor(args.weights)
    else:
        @jax.jit
        def extractor(batch):
            x = jax.image.resize(batch, (batch.shape[0], 32, 32, 3), "bilinear")
            return x.reshape(x.shape[0], -1)

    mesh = None
    if args.dp:
        from ..parallel import sharding as sh
        mesh = sh.make_mesh()

    def folder_features(path):
        ds = FolderOfImages(path, size=args.size)
        n = len(ds) if args.max_images is None else min(args.max_images, len(ds))
        feats = []
        for batch in ds.batches(args.batch_size):
            batch = np.asarray(batch)
            real_n = batch.shape[0]
            if mesh is not None:
                # pad the tail batch so its leading dim shards evenly, then
                # place it batch-sharded over the mesh; XLA runs the
                # backbone per-shard and the host gather replaces the
                # reference's accelerate.gather
                from ..parallel import sharding as sh
                d = mesh.devices.size
                pad = (-real_n) % d
                if pad:
                    batch = np.concatenate(
                        [batch, np.zeros((pad,) + batch.shape[1:],
                                         batch.dtype)])
                placed = sh.shard_batch(jnp.asarray(batch), mesh)
                # cross-process all-gather (multi-host) / host read (single)
                out = sh.gather_to_host(extractor(placed))[:real_n]
            else:
                out = np.asarray(extractor(jnp.asarray(batch)))
            feats.append(out)
            if sum(f.shape[0] for f in feats) >= n:
                break
        return jnp.asarray(np.concatenate(feats)[:n])

    f_real = folder_features(args.real)
    f_fake = folder_features(args.fake)
    out = {
        "fid": float(evaluation.fid(f_real, f_fake)),
        "kid": float(evaluation.kid(f_real, f_fake)),
        "n_real": int(f_real.shape[0]),
        "n_fake": int(f_fake.shape[0]),
        "backbone": args.backbone,
    }
    # every process computes (and returns) the metrics from the gathered
    # features; only process 0 reports, like the reference's rank-0 logging
    if jax.process_index() == 0:
        print(json.dumps(out))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
