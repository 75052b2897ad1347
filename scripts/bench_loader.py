#!/usr/bin/env python
"""Input-pipeline throughput: native C++ loader vs synchronous Python/PIL.

Generates an FFHQ-like folder of 1024px JPEGs, then measures images/sec for
the ADM 256px center-crop pipeline (decode -> BOX halvings -> BICUBIC ->
crop -> f32 normalize) through:
  - the synchronous Python path (PIL per item, like the reference with
    num_workers=0),
  - the native loader at several thread counts.

Usage: python scripts/bench_loader.py [n_images] [image_px] [target_px]
"""

import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    src_px = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    tgt_px = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from PIL import Image
    from kdip_tpu import native
    from kdip_tpu.data import ImageDataset

    if not native.available():
        print("native loader unavailable:", native.build_error())
        return

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="kdip_loader_bench_")
    base = rng.randint(0, 256, (src_px, src_px, 3), np.uint8)
    for i in range(n):
        # vary content a little so JPEG decode cost is realistic
        arr = np.roll(base, i * 17, axis=1)
        Image.fromarray(arr).save(os.path.join(tmp, f"{i:04d}.jpg"),
                                  quality=95)

    batch = 16
    results = {}

    t0 = time.time()
    for b in ImageDataset(tmp, image_size=tgt_px).batches(batch):
        pass
    results["python (sync)"] = n / (time.time() - t0)

    for workers in (1, 2, 4, 8, 16):
        ds = ImageDataset(tmp, image_size=tgt_px)
        t0 = time.time()
        for b in ds.batches(batch, num_workers=workers):
            pass
        results[f"native x{workers}"] = n / (time.time() - t0)

    width = max(len(k) for k in results)
    base_rate = results["python (sync)"]
    print(f"host CPUs: {os.cpu_count()} (thread scaling needs >1)")
    for k, v in results.items():
        print(f"{k:<{width}}  {v:8.1f} img/s   {v / base_rate:5.2f}x")


if __name__ == "__main__":
    main()
