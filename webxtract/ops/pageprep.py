"""Page-image pre-processing: grayscale, Otsu binarization, projection-
profile skew estimation and shear-based deskew.

This is the enhancement leg the reference's preprocessing Lambda leaves
as an explicit extension point — source/ocr/preprocessing/fn-preprocess/
main.py:126-129 returns an S3 location instead of a yes/no precisely
because "it's common for pre-processing to *enhance* the image (e.g.
skew/blur/lighting/cropping corrections)" — and the one the BASELINE
north star names directly ("rotation/skew correction, binarization
heuristics"). The reference delegates all pixel work to Rekognition;
there is no reference implementation to match, so the operators here
are the standard published methods (Otsu 1979 between-class-variance
thresholding; Postl/Baird projection-profile skew detection), computed
EXACTLY:

  * every score is integer (Python-int cross-multiplication for the
    Otsu variance ratio, int64 sums of squared row counts for the
    profile sharpness), so argmaxes are bit-deterministic and
    independent of batch layout or float summation order;
  * deskew is the small-angle vertical-shear model (per-column integer
    row shift ``rint(x * tan(theta))`` — ``rint`` is odd, so shearing
    by ``-theta`` is the exact inverse of shearing by ``theta`` up to
    canvas padding). True large-angle rotation needs a 3-shear
    decomposition and resampling; document pages skew by a few
    degrees, where the single shear IS the standard correction.

Per-image work is embarrassingly parallel: the batch stage runs as
``map_batches`` tasks over small blob-sized batches (media rows are
KB-MB each; SURVEY.md §4.2 skew note), decoding via the pure-numpy
codecs in ops/imagecodec. At 100 TB nothing here exchanges — one
streaming pass, metadata out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Candidate grid for skew search: +-12 degrees in 0.25-degree steps.
# Stored/reported in millidegrees so every output column is integer.
SKEW_MAX_MDEG = 12_000
SKEW_STEP_MDEG = 250


def to_gray(arr: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 RGB -> HxW uint8 luma, integer BT.601
    ``(299 R + 587 G + 114 B + 500) // 1000`` — exact, no float."""
    a = arr.astype(np.int32)
    g = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2] + 500) // 1000
    return g.astype(np.uint8)


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's between-class-variance-maximizing threshold, EXACT.

    Returns t in [0, 255]; class 0 is ``pixel <= t``. The classic
    criterion maximizes w0*w1*(mu0-mu1)^2 which as integers is
    ``(sum0*w1 - (S-sum0)*w0)^2 / (w0*w1)``; candidates are compared by
    Python-int cross-multiplication (num^2 can exceed 2^127 on large
    pages), so the argmax is exact. Ties break toward the SMALLEST t.
    A single-valued image returns that value (degenerate split)."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.int64)
    n = int(hist.sum())
    if n == 0:
        return 0
    nz = np.nonzero(hist)[0]
    if nz.size == 1:
        return int(nz[0])
    s_all = int((hist * np.arange(256, dtype=np.int64)).sum())
    w0 = np.cumsum(hist)
    s0 = np.cumsum(hist * np.arange(256, dtype=np.int64))
    best_t, best_num2, best_den = 0, -1, 1
    for t in range(256):
        a, sa = int(w0[t]), int(s0[t])
        b = n - a
        if a == 0 or b == 0:
            continue
        num = sa * b - (s_all - sa) * a
        num2, den = num * num, a * b
        # exact compare: num2/den > best_num2/best_den
        if num2 * best_den > best_num2 * den:
            best_t, best_num2, best_den = t, num2, den
    return best_t


def _shifts(width: int, mdeg: int) -> np.ndarray:
    """Per-column integer row shift for a vertical shear of ``mdeg``
    millidegrees: ``rint(x * tan(theta))``. ``np.rint`` (half-even) is
    an odd function, so ``_shifts(w, -m) == -_shifts(w, m)`` exactly —
    the property that makes deskew the exact inverse of the shear."""
    t = np.tan(np.deg2rad(mdeg / 1000.0))
    return np.rint(np.arange(width, dtype=np.float64) * t).astype(np.int64)


def estimate_skew_mdeg(ink: np.ndarray,
                       max_mdeg: int = SKEW_MAX_MDEG,
                       step_mdeg: int = SKEW_STEP_MDEG) -> int:
    """Projection-profile skew estimate over a boolean ink mask.

    Returns the angle the page IS skewed by (so the correction is a
    shear by the negation — ``deskew``). For each candidate the ink
    pixels are counter-sheared (``ys - shift``) and the row-projection
    profile's sum of squared counts (int64 — exact) scores the
    candidate: text lines aligned with the scan rows concentrate ink
    into few rows and maximize the sum of squares. Ties break toward
    the smallest |angle|, then the smaller (more negative) angle, so
    the result is unique. Returns millidegrees; an empty mask
    returns 0."""
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return 0
    h, width = int(ink.shape[0]), int(ink.shape[1])
    grid, smat = _shift_matrix(width, max_mdeg, step_mdeg)
    # all candidates in ONE bincount: counter-sheared rows per candidate
    # land in disjoint strided segments (row range is [-maxs, h+maxs));
    # int32 keys halve the memory traffic of the (n_cand, n_ink) matrix
    # (falls back to int64 only past 2^31 total bins — km-tall pages)
    maxs = int(np.abs(smat).max())
    stride = h + 2 * maxs
    dt = np.int32 if len(grid) * stride < 2 ** 31 else np.int64
    ys = ys.astype(dt)
    rows = ys[None, :] - smat.astype(dt)[:, xs]   # (n_cand, n_ink)
    base = (np.arange(len(grid), dtype=dt) * stride + maxs)
    counts = np.bincount((rows + base[:, None]).ravel(),
                         minlength=len(grid) * stride)
    counts = counts.reshape(len(grid), stride).astype(np.int64)
    scores = (counts * counts).sum(axis=1)
    best = max(zip(scores.tolist(), (-abs(m) for m in grid),
                   (-m for m in grid)))
    return -best[2]


_SHIFT_CACHE: dict = {}


def _shift_matrix(width: int, max_mdeg: int, step_mdeg: int):
    """Candidate grid + per-candidate integer shift rows, cached per
    (width, grid) — the sweep reuses it for every image of a shape."""
    key = (width, max_mdeg, step_mdeg)
    hit = _SHIFT_CACHE.get(key)
    if hit is None:
        grid = list(range(-max_mdeg, max_mdeg + 1, step_mdeg))
        smat = np.stack([_shifts(width, m) for m in grid])
        hit = _SHIFT_CACHE[key] = (grid, smat)
    return hit


def vshear(arr: np.ndarray, mdeg: int, fill: int = 255) -> np.ndarray:
    """Vertical shear of an HxW or HxWxC uint8 image by ``mdeg``
    millidegrees: column x moves down by ``_shifts(w, mdeg)[x]``. The
    canvas grows to hold every shifted pixel; exposed canvas is
    ``fill``. ``vshear(vshear(img, m), -m)`` crops back to ``img``
    exactly (see ``unshear_crop``)."""
    h, w = arr.shape[:2]
    sh = _shifts(w, mdeg)
    lo, hi = int(sh.min()), int(sh.max())
    out_h = h + (hi - lo)
    out_shape = (out_h, w) + arr.shape[2:]
    out = np.full(out_shape, fill, dtype=arr.dtype)
    ys = np.arange(h, dtype=np.int64)
    # per-column assignment is a strided copy; vectorize over columns
    # with advanced indexing (rows matrix is h x w).
    rows = ys[:, None] + (sh - lo)[None, :]
    cols = np.broadcast_to(np.arange(w), (h, w))
    out[rows, cols] = arr
    return out


def deskew(arr: np.ndarray, est_mdeg: int, fill: int = 255) -> np.ndarray:
    """Correct an estimated skew: shear by ``-est_mdeg``. For an image
    produced by ``vshear(orig, est_mdeg)`` this is the exact inverse up
    to the fill-padding rows (``unshear_crop`` recovers ``orig``
    bit-identically; the batch stage leaves the padding in — downstream
    extraction is whitespace-insensitive)."""
    return vshear(arr, -est_mdeg, fill=fill)


def unshear_crop(arr: np.ndarray, orig_h: int, mdeg: int) -> np.ndarray:
    """Crop the double-shear padding: after ``vshear(x, m)`` then
    ``vshear(., -m)`` the original image occupies a known row band —
    rows ``[hi1 - lo1 - (hi2 ... )]`` reduce to a fixed offset because
    the two shift vectors are exact negations. Offset = max-shift of
    the FORWARD shear minus its min, folded by the reverse shear's own
    padding; with s2 = -s1 the original row 0 lands at
    ``hi1 - lo1 + lo1 - lo1 = hi1 - lo1``... computed directly below
    from the shift vectors to avoid sign errors."""
    w = arr.shape[1]
    s1 = _shifts(w, mdeg)
    lo1, hi1 = int(s1.min()), int(s1.max())
    # forward: row y, col x -> y + s1[x] - lo1   (height h + hi1 - lo1)
    # reverse shear by -m: shifts -s1, min = -hi1; row r -> r - s1[x] + hi1
    # so original y -> y + s1[x] - lo1 - s1[x] + hi1 = y + (hi1 - lo1):
    # a constant offset — the original sits at rows [hi1-lo1, hi1-lo1+h).
    off = hi1 - lo1
    return arr[off:off + orig_h]


def ink_ppm(ink: np.ndarray) -> int:
    """Ink coverage in integer parts-per-million of the pixel count."""
    n = ink.size
    return int(ink.sum()) * 1_000_000 // n if n else 0


class PagePrep:
    """``map_batches`` stage: decode -> grayscale -> Otsu binarize ->
    skew estimate -> deskew -> re-encode (PNG, lossless).

    In (media_id:int64, media:binary) -> out one row per image:
    (media_id, ok, width, height, otsu_thr, ink_ppm, skew_mdeg,
    deskewed:binary). Undecodable rows keep their id with ok=False and
    null metadata — rejects are data, never exceptions (reference
    M1/M4 semantics). Stateless numpy work: runs in the task pool;
    keep batches small (blob-heavy rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .imagecodec import decode_image, encode_png

        ids = batch.column("media_id").to_pylist()
        raws = batch.column("media").to_pylist()
        ok, ws, hs, thrs, inks, skews, outs = [], [], [], [], [], [], []
        for raw in raws:
            arr = decode_image(raw)
            if arr is None:
                ok.append(False)
                ws.append(None); hs.append(None); thrs.append(None)
                inks.append(None); skews.append(None); outs.append(None)
                continue
            gray = to_gray(arr)
            thr = otsu_threshold(gray)
            ink = gray <= thr
            mdeg = estimate_skew_mdeg(ink)
            fixed = deskew(arr, mdeg)
            ok.append(True)
            hs.append(arr.shape[0]); ws.append(arr.shape[1])
            thrs.append(thr); inks.append(ink_ppm(ink)); skews.append(mdeg)
            outs.append(encode_png(np.ascontiguousarray(fixed)))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "ok": pa.array(ok, pa.bool_()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "otsu_thr": pa.array(thrs, pa.int32()),
            "ink_ppm": pa.array(inks, pa.int64()),
            "skew_mdeg": pa.array(skews, pa.int64()),
            "deskewed": pa.array(outs, pa.binary()),
        })


def page_prep(ds, batch_size: int = 16):
    """Run the pre-processing stage over a (media_id, media) Dataset."""
    return ds.map_batches(PagePrep(), batch_format="pyarrow",
                          batch_size=batch_size)


# The planted grid is COARSER than the estimator grid: on a 192-px-wide
# page a 0.25-degree shear moves no column by even one pixel (tan(0.25
# deg) * 191 < 1), so sub-degree angles are genuinely indistinguishable
# under the integer shear model at this width — planting on a 1-degree
# grid keeps exact recovery well-posed while the estimator still sweeps
# its fine grid (and must pick the planted node over its 0.25-degree
# neighbors, which differ by single-pixel shifts in the tail columns).
PLANT_STEP_MDEG = 1_000


def planted_skew_mdeg(doc_id: int) -> int:
    """Deterministic planted skew for the synthetic corpus: a Knuth
    multiplicative hash folded onto a 1-degree grid inside the
    estimator's sweep range, so exact recovery is well-posed."""
    span = 2 * (SKEW_MAX_MDEG // PLANT_STEP_MDEG) + 1
    k = (doc_id * 2654435761) % span
    return (k - span // 2) * PLANT_STEP_MDEG


def synth_page_corpus(sf_dir: str, n: int | None = None):
    """Deterministic text-page-like corpus from the documents table ids:
    a white 192x96 page with 2px-tall dark text lines every 6 rows,
    seeded word gaps, sheared by ``planted_skew_mdeg(doc_id)`` via the
    SAME integer shear the deskewer inverts, encoded LOSSLESSLY
    (BMP/PPM/PNG by id % 3 — no lossy leg, so recovery assertions are
    bit-exact). Pure plumbing fixture — real corpora read binary
    columns from parquet."""
    import ray.data as rd

    from .imagecodec import encode_bmp24, encode_png, encode_ppm

    encoders = [encode_bmp24, encode_ppm, encode_png]
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)
    try:
        import ray

        ids = ids.repartition(
            max(2, int(ray.cluster_resources().get("CPU", 8))))
    except Exception:
        pass

    def render(batch: pa.Table) -> pa.Table:
        out_id, out_raw = [], []
        for i in batch.column("doc_id").to_pylist():
            rng = np.random.default_rng(i)
            page = np.full((96, 192), 255, np.uint8)
            for y in range(6, 90, 6):  # text lines: rows y, y+1
                # word gaps: ~20% of 8px cells stay white
                cells = rng.random(24) >= 0.2
                mask = np.repeat(cells, 8)
                page[y:y + 2, :][:, mask] = 16
            rgb = np.repeat(page[:, :, None], 3, axis=2)
            skewed = vshear(rgb, planted_skew_mdeg(i))
            out_id.append(i)
            out_raw.append(encoders[i % 3](np.ascontiguousarray(skewed)))
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "media": pa.array(out_raw, pa.binary())})

    return ids.map_batches(render, batch_format="pyarrow", batch_size=64)


def images_page_prep(sf_dir: str):
    """Query-surface wrapper (rows-only: pixel work is not
    SQL-expressible; exact-recovery, Otsu-vs-brute-force and
    batch-invariance are pytest-gated): synthesize the deterministic
    skewed-page corpus for sf_dir's documents, run the pre-processing
    stage, and return the per-page metadata (the deskewed blob is
    dropped from the query result — the driver compares metadata
    rows; tests decode and compare the pixels)."""
    out = page_prep(synth_page_corpus(sf_dir))
    return out.select_columns(["media_id", "ok", "width", "height",
                               "otsu_thr", "ink_ppm", "skew_mdeg"]) \
              .sort("media_id")


def images_page_skew(sf_dir: str):
    """ORACLED projection of the pre-processing stage: (media_id, width,
    height, skew_mdeg) with everything int64. The planted skew is a
    closed-form function of doc_id and the sheared canvas height is
    ``96 + |rint(191 * tan(theta))|`` (the shear's shift span; rint and
    DuckDB's half-away round agree on all 25 planted angles — verified
    in tests), so a DuckDB twin recomputes every row from doc_id alone
    and a hash match proves the full pixel path END TO END: encode ->
    decode -> grayscale -> Otsu -> projection-profile estimate
    recovered EXACTLY the planted angle for every document."""
    import pyarrow.compute as pc

    out = page_prep(synth_page_corpus(sf_dir))

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t.column("media_id"),
            "width": pc.cast(t.column("width"), pa.int64()),
            "height": pc.cast(t.column("height"), pa.int64()),
            "skew_mdeg": t.column("skew_mdeg"),
        })

    return out.map_batches(widen, batch_format="pyarrow",
                           zero_copy_batch=True).sort("media_id")
