"""Page pre-processing (ops/pageprep): exact-integer Otsu, projection-
profile skew estimation, shear deskew — the north-star's "rotation/skew
correction, binarization heuristics" leg (the reference's preprocessing
Lambda names exactly this enhancement as its extension point,
source/ocr/preprocessing/fn-preprocess/main.py:126-129)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from webxtract.ops.pageprep import (
    PagePrep, SKEW_MAX_MDEG, _shifts, deskew, estimate_skew_mdeg,
    images_page_prep, ink_ppm, otsu_threshold, planted_skew_mdeg,
    to_gray, unshear_crop, vshear,
)

SF = "/root/testdata/sf0.001"


def _page(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    page = np.full((96, 192), 255, np.uint8)
    for y in range(6, 90, 6):
        cells = rng.random(24) >= 0.2
        page[y:y + 2, :][:, np.repeat(cells, 8)] = 16
    return np.repeat(page[:, :, None], 3, axis=2)


def test_otsu_matches_brute_force():
    """Exact-int Otsu == float brute force maximizing w0*w1*(mu0-mu1)^2
    (independent replica; ties cannot occur on this input)."""
    g = np.random.default_rng(7).integers(0, 256, (64, 80)).astype(np.uint8)
    hist = np.bincount(g.ravel(), minlength=256)
    n = g.size
    best, bt = -1.0, 0
    for t in range(255):
        a = int(hist[:t + 1].sum())
        b = n - a
        if a == 0 or b == 0:
            continue
        idx = np.arange(256)
        mu0 = float((idx[:t + 1] * hist[:t + 1]).sum()) / a
        mu1 = float((idx[t + 1:] * hist[t + 1:]).sum()) / b
        s = a * b * (mu0 - mu1) ** 2
        if s > best:
            best, bt = s, t
    assert otsu_threshold(g) == bt


def test_otsu_degenerate_and_bimodal():
    assert otsu_threshold(np.full((4, 4), 77, np.uint8)) == 77
    img = np.full((10, 10), 255, np.uint8)
    img[:5] = 16
    thr = otsu_threshold(img)
    assert 16 <= thr < 255
    assert ((img <= thr) == (img == 16)).all()


def test_shifts_are_odd():
    """rint is odd -> shear by -m is the exact inverse shift of m."""
    for m in range(-SKEW_MAX_MDEG, SKEW_MAX_MDEG + 1, 250):
        assert (_shifts(192, -m) == -_shifts(192, m)).all()


def test_planted_round_matches_duckdb_half_away():
    """The oracle's height formula uses DuckDB round (half away); pin
    that np.rint agrees on every planted angle AND that the shift span
    equals |rint(191 tan theta)| (shifts are monotone, s[0] = 0)."""
    for k in range(-12, 13):
        x = 191 * math.tan(math.radians(k))
        away = math.copysign(math.floor(abs(x) + 0.5), x)
        assert float(np.rint(x)) == away
        s = _shifts(192, k * 1000)
        assert int(s.max() - s.min()) == int(abs(away))


def test_skew_recovery_and_deskew_roundtrip_exact():
    """Estimator recovers the planted angle exactly; deskew + crop
    reproduces the pre-shear page bit-identically."""
    for i in [1, 2, 3, 7, 10, 23, 55, 101, 999, 12345]:
        rgb = _page(i)
        m = planted_skew_mdeg(i)
        skewed = vshear(rgb, m)
        gray = to_gray(skewed)
        ink = gray <= otsu_threshold(gray)
        est = estimate_skew_mdeg(ink)
        assert est == m, (i, m, est)
        assert np.array_equal(unshear_crop(deskew(skewed, est), 96, m),
                              rgb)


def test_estimate_skew_empty_mask():
    assert estimate_skew_mdeg(np.zeros((10, 10), bool)) == 0


def test_ink_ppm():
    ink = np.zeros((10, 100), bool)
    ink[0] = True
    assert ink_ppm(ink) == 100_000
    assert ink_ppm(np.zeros((0, 0), bool)) == 0


def test_pageprep_stage_poison_and_columns():
    """Undecodable rows become ok=False data rows, never exceptions."""
    from webxtract.ops.imagecodec import encode_png

    rgb = _page(3)
    batch = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "media": pa.array(
            [encode_png(np.ascontiguousarray(rgb)), b"\x00junk", None],
            pa.binary()),
    })
    out = PagePrep()(batch)
    assert out.column("ok").to_pylist() == [True, False, False]
    assert out.column("skew_mdeg").to_pylist()[0] == 0  # unsheared page
    assert out.column("width").to_pylist() == [192, None, None]
    deskewed = out.column("deskewed").to_pylist()
    assert deskewed[1] is None and deskewed[2] is None


def test_pageprep_batch_invariance():
    """Same rows -> same output regardless of batch split."""
    from webxtract.ops.imagecodec import encode_bmp24

    rows = []
    for i in [4, 9, 31]:
        img = vshear(_page(i), planted_skew_mdeg(i))
        rows.append(encode_bmp24(np.ascontiguousarray(img)))
    ids = pa.array([4, 9, 31], pa.int64())
    full = PagePrep()(pa.table({"media_id": ids,
                                "media": pa.array(rows, pa.binary())}))
    parts = [PagePrep()(pa.table({
        "media_id": ids[i:i + 1],
        "media": pa.array(rows[i:i + 1], pa.binary())}))
        for i in range(3)]
    assert pa.concat_tables(parts).equals(full)


@pytest.mark.usefixtures("ray_session")
def test_images_page_prep_e2e_recovers_all_plants():
    """Full Ray path at sf0.001: every document's planted skew is
    recovered exactly, every row decodes, and the deskewed blob (from
    the unprojected stage) round-trips to the pre-shear page."""
    from webxtract.ops.pageprep import page_prep, synth_page_corpus

    df = images_page_prep(SF).to_pandas()
    assert len(df) == 500 and df["ok"].all()
    planted = df["media_id"].map(planted_skew_mdeg)
    assert (df["skew_mdeg"] == planted).all()
    # spot-check the deskewed pixels through the Ray stage
    from webxtract.ops.imagecodec import decode_image

    sample = (page_prep(synth_page_corpus(SF, n=8))
              .to_pandas().sort_values("media_id"))
    for _, row in sample.iterrows():
        arr = decode_image(row["deskewed"])
        m = planted_skew_mdeg(int(row["media_id"]))
        assert np.array_equal(unshear_crop(arr, 96, m),
                              _page(int(row["media_id"])))
