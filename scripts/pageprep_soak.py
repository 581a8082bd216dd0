"""Page pre-processing soak: Otsu + skew estimation + deskew at 20x
query-fixture scale with exact planted truth.

100,000 synthetic text pages, each sheared by a closed-form planted
angle and encoded losslessly (BMP/PPM/PNG round-robin), driven through
the REAL PagePrep stage: every estimated angle must EQUAL its plant and
a deterministic 1-in-9973 sample must deskew back to the pre-shear
pixels bit-identically.

Run: python scripts/pageprep_soak.py [--docs 100000] [--cpus 32]
"""

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.imagecodec import (decode_image, encode_bmp24,
                                          encode_png, encode_ppm)
    from webxtract.ops.pageprep import (PagePrep, planted_skew_mdeg,
                                        unshear_crop, vshear)

    encoders = [encode_bmp24, encode_ppm, encode_png]

    def page(i: int) -> np.ndarray:
        rng = np.random.default_rng(i)
        p = np.full((96, 192), 255, np.uint8)
        for y in range(6, 90, 6):
            cells = rng.random(24) >= 0.2
            p[y:y + 2, :][:, np.repeat(cells, 8)] = 16
        return np.repeat(p[:, :, None], 3, axis=2)

    def render(batch: pa.Table) -> pa.Table:
        ids, raws = [], []
        for i in batch.column("id").to_pylist():
            img = vshear(page(i), planted_skew_mdeg(i))
            ids.append(i)
            raws.append(encoders[i % 3](np.ascontiguousarray(img)))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "media": pa.array(raws, pa.binary())})

    N = args.docs
    t0 = time.monotonic()
    corpus = rd.range(N).repartition(args.cpus * 4) \
        .map_batches(render, batch_format="pyarrow", batch_size=128) \
        .materialize()
    print(f"render+materialize {N} pages: "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    t0 = time.monotonic()
    out = corpus.map_batches(PagePrep(), batch_format="pyarrow",
                             batch_size=32).materialize()
    dt = time.monotonic() - t0
    fails = 0

    meta = out.select_columns(["media_id", "ok", "skew_mdeg"]) \
        .to_pandas()
    planted = meta.media_id.map(planted_skew_mdeg)
    ok = bool(meta.ok.all()) and bool((meta.skew_mdeg == planted).all())
    print(f"PagePrep: {len(meta)} pages in {dt:.1f}s = "
          f"{len(meta) / dt:,.0f} pages/s; all-angles-exact={ok}",
          flush=True)
    fails += not ok

    sample = out.filter(lambda r: r["media_id"] % 9973 == 0) \
        .to_pandas()
    bad = 0
    for r in sample.itertuples():
        arr = decode_image(r.deskewed)
        if not np.array_equal(
                unshear_crop(arr, 96, planted_skew_mdeg(r.media_id)),
                page(int(r.media_id))):
            bad += 1
    print(f"deskew round-trip: {len(sample)} sampled, "
          f"{bad} mismatched", flush=True)
    fails += bad > 0

    print("RESULT:", "PASS" if fails == 0 else f"FAIL({fails})")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
