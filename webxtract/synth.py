"""Deterministic synthetic web-page corpus (FIXTURES.md).

Everything derives from ``random.Random(seed ^ doc_id)`` — no wall-clock,
no uuid — so goldens are stable and byte-identical checks are meaningful
(SURVEY.md §7.4 determinism mandate; replaces the reference's receipts.zip
sample corpus, reference preprocessing/README.md:48-57).

Family mix by ``doc_id % 100`` (FIXTURES.md §1):
    receipt 40% | article 25% | linkfarm 10% | noisy 10% | bad 10% | pdfish 5%
plus ~3% duplicate rows (same url, later warc_ts) for dedup tests.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from . import schema as S

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

VENDORS = [
    "My Cool Restaurant", "Java Junction Cafe", "Happy Mart", "Noodle House 88",
    "Green Grocer Co", "Corner Bakery", "Tech Supplies Ltd", "Sunrise Diner",
    "Blue Bottle Books", "City Pharmacy", "Prime Hardware", "Lucky Dragon",
    "Fresh Fields Market", "Urban Outfitters Depot", "Golden Spoon",
]

ITEMS = [
    "Espresso", "Latte", "Sandwich", "Salad Bowl", "Orange Juice", "Bagel",
    "Soup of the Day", "Iced Tea", "Fried Rice", "Spring Rolls", "Notebook",
    "Batteries AA", "Light Bulb", "Milk 1L", "Bread Loaf", "Eggs Dozen",
]

WORDS = (
    "the quick brown fox jumps over a lazy dog while rain falls on distant "
    "hills and rivers carry stories from mountain towns to quiet harbors "
    "where sailors trade spices maps lanterns and songs about long winters "
    "markets open early vendors arrange fruit bread cheese flowers neatly "
    "children watch trains cross iron bridges under pale morning light"
).split()

NAV_LINKS = ["Home", "About", "Contact", "Products", "Blog", "Careers", "Login",
             "Privacy", "Terms", "Sitemap", "Support", "News"]

LANG_CYCLE = ["en"] * 9 + ["de", "th"]  # ~82% en, cycled by doc_id

DATE_FORMATS = [
    lambda r: f"{r.randint(1, 12):02d}/{r.randint(1, 28):02d}/{r.randint(2020, 2024)}",
    lambda r: f"{r.randint(2020, 2024)}-{r.randint(1, 12):02d}-{r.randint(1, 28):02d}",
    lambda r: f"{r.randint(1, 28)}-{r.choice(['Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec'])}-{r.randint(2020, 2024)}",
]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _nav(rng: random.Random, n: int = 6) -> str:
    links = " ".join(
        f'<a href="/{w.lower()}">{w}</a>' for w in rng.sample(NAV_LINKS, n)
    )
    return f'<div class="nav">{links}</div>'


def _family(doc_id: int) -> str:
    m = doc_id % 100
    if m < 40:
        return "receipt"
    if m < 65:
        return "article"
    if m < 75:
        return "linkfarm"
    if m < 85:
        return "noisy"
    if m < 95:
        return "bad"
    return "pdfish"


def _receipt(rng: random.Random) -> tuple[str, str]:
    vendor = rng.choice(VENDORS)
    date = rng.choice(DATE_FORMATS)(rng)
    n_items = rng.randint(2, 6)
    item_rows = []
    subtotal = 0.0
    for _ in range(n_items):
        price = rng.randint(150, 4999) / 100.0
        subtotal += price
        item_rows.append((rng.choice(ITEMS), price))
    # ~30% of receipts itemize in an HTML table (exercises the
    # TABLE_CELL path end to end), the rest as <p> lines
    if rng.random() < 0.3:
        cells = "\n".join(
            f"<tr><td>{name}</td><td>${price:.2f}</td></tr>"
            for name, price in item_rows)
        lines = [f"<table>\n{cells}\n</table>"]
    else:
        lines = [f"<p>{name} ${price:.2f}</p>" for name, price in item_rows]
    tax = round(subtotal * 0.1, 2)
    total = round(subtotal + tax, 2)
    date_labelled = rng.random() < 0.7
    date_row = (
        f"<p>Date: {date}</p>" if date_labelled
        else f"<p>Served on {date} by register {rng.randint(1, 9)}</p>"
    )
    total_label = rng.choice(["Total", "Amount Payable", "TOTAL", "Total Amount"])
    # ~15% of receipts have an unlabelled total (no "key: value" shape) ->
    # no KV candidate -> Total confidence 0 -> review route, mirroring the
    # reference's "verbose invoice-style documents" fallback discussion
    # (postprocessing/fn-postprocess/main.py:102-103).
    total_sep = ": " if rng.random() < 0.85 else " "
    body = (
        f'<div class="receipt">\n<h1>{vendor}</h1>\n'
        f"<p>{rng.randint(1, 999)} {rng.choice(WORDS).title()} Street</p>\n"
        f"{date_row}\n" + "\n".join(lines) + "\n"
        f"<p>Subtotal: ${subtotal:.2f}</p>\n<p>Tax: ${tax:.2f}</p>\n"
        f"<p>{total_label}{total_sep}${total:.2f}</p>\n"
        f"<p>Thank you for shopping with us today come again</p>\n</div>"
    )
    html = (
        f"<html><head><title>Receipt</title><style>body{{margin:0}}</style></head>"
        f"<body>\n{_nav(rng)}\n{body}\n"
        f'<div class="footer"><a href="/privacy">Privacy</a> <a href="/terms">Terms</a></div>'
        f"</body></html>"
    )
    return html, f"{vendor} receipt total {total:.2f} on {date}"


def _article(rng: random.Random) -> tuple[str, str]:
    title = _sentence(rng, 5).title()
    paras = [f"<p>{_sentence(rng, rng.randint(25, 60))}.</p>" for _ in range(rng.randint(3, 7))]
    sidebar = " ".join(
        f'<a href="/t/{i}">{_sentence(rng, 2)}</a>' for i in range(rng.randint(5, 10))
    )
    html = (
        f"<html><head><title>{title}</title></head><body>\n{_nav(rng)}\n"
        f'<div class="main">\n<h1>{title}</h1>\n' + "\n".join(paras) + "\n</div>\n"
        f'<div class="sidebar">{sidebar}</div>\n'
        f'<div class="footer">{_nav(rng, 4)}</div>\n'
        f"</body></html>"
    )
    return html, title


def _linkfarm(rng: random.Random) -> tuple[str, str]:
    rows = "\n".join(
        f'<li><a href="/p/{i}">{_sentence(rng, rng.randint(2, 4))}</a></li>'
        for i in range(rng.randint(20, 40))
    )
    html = (
        f"<html><head><title>Links</title></head><body>\n{_nav(rng)}\n"
        f"<ul>\n{rows}\n</ul>\n{_nav(rng, 5)}\n</body></html>"
    )
    return html, "link directory"


def _noisy(rng: random.Random) -> tuple[str, str]:
    title = _sentence(rng, 4).title()
    paras = [f"<p>{_sentence(rng, rng.randint(20, 45))} &amp; more.</p>"
             for _ in range(rng.randint(2, 5))]
    html = (
        f"<html><head><script>var x = {rng.randint(0, 99)};</script>"
        f"<style>.x{{color:red}}</style></head><body>\n{_nav(rng)}\n"
        f"<div><div class=main>\n<h1>{title} &quot;quoted&quot;</h1>\n"
        + "\n".join(paras)
        + "\n</span></div>\n"  # stray close, unclosed div
        f"<script>if (x) {{ document.write('junk'); }}</script>\n"
        f"</body>"  # missing </html>
    )
    return html, title


def _bad(rng: random.Random) -> bytes:
    kind = rng.randint(0, 4)
    if kind == 0:
        return b""
    if kind == 1:  # truncated fragment, under the min-size floor
        return b"<html><bo"
    if kind == 2:  # undecodable bytes (invalid utf-8 continuation)
        return b"\xff\xfe" + bytes(rng.getrandbits(8) for _ in range(200)) + b"\x80\x80"
    if kind == 3:  # non-HTML plain bytes
        return (" ".join(rng.choice(WORDS) for _ in range(60))).encode()
    # oversized blob (> quality-gate max_bytes cap)
    return b"<html><body>" + (b"A" * 90_000) + b"</body></html>"


def _pdfish(rng: random.Random) -> tuple[str, str]:
    """Deterministic positioned-text payload (FIXTURES.md §2): one token per
    line, ``x0 y0 x1 y1 page conf text``, floats in a 0-1000 page space."""
    vendor = rng.choice(VENDORS)
    date = rng.choice(DATE_FORMATS)(rng)
    total = rng.randint(500, 19999) / 100.0
    sub = round(total * 0.9, 2)
    out = ["%XYD1"]

    def tok(x0, y0, text, conf, w=None):
        w = w if w is not None else 18 * len(text)
        out.append(f"{x0:.1f} {y0:.1f} {x0 + w:.1f} {y0 + 24:.1f} 0 {conf:.1f} {text}")

    # title line (vendor analogue), word by word
    x = 100.0
    for w in vendor.split():
        tok(x, 40.0, w, 90.0 + (len(w) % 7))
        x += 18 * len(w) + 12
    # two-column body
    for i in range(rng.randint(3, 6)):
        words = [rng.choice(WORDS) for _ in range(4)]
        x = 60.0
        for w in words:
            tok(x, 120.0 + 30 * i, w, 80.0 + (len(w) % 9))
            x += 18 * len(w) + 10
        x = 560.0
        for w in [rng.choice(WORDS) for _ in range(3)]:
            tok(x, 120.0 + 30 * i, w, 80.0 + (len(w) % 9))
            x += 18 * len(w) + 10
    # KV region: labels left, values right, same baseline
    kv = [("Date:", date), ("Subtotal:", f"${sub:.2f}"), ("Total:", f"${total:.2f}")]
    for i, (k, v) in enumerate(kv):
        y = 420.0 + 34 * i
        tok(80.0, y, k, 88.0 + i)
        tok(320.0, y, v, 84.0 + i)
    # small table grid 2x3 (cell spacing > phrase-group gap so cells stay
    # distinct groups for the grid detector)
    for r in range(2):
        for c in range(3):
            tok(600.0 + 140 * c, 420.0 + 40 * r, f"c{r}{c}", 75.0 + r + c, w=60)
    return "\n".join(out) + "\n", f"{vendor} {date} {total:.2f}"


def render_doc(doc_id: int, seed: int = 42) -> dict:
    """Render one document row deterministically."""
    rng = random.Random(seed ^ (doc_id * 2654435761 % (1 << 32)))
    fam = _family(doc_id)
    site = doc_id % 97
    url = f"https://site{site}.example/{fam}/{doc_id}"
    if fam == "bad":
        html_bytes = _bad(rng)
        text = "unavailable"
    elif fam == "pdfish":
        html, text = _pdfish(rng)
        html_bytes = html.encode("utf-8")
    else:
        html, text = {
            "receipt": _receipt, "article": _article,
            "linkfarm": _linkfarm, "noisy": _noisy,
        }[fam](rng)
        html_bytes = html.encode("utf-8")
    return {
        "url": url,
        "warc_ts": EPOCH_US + doc_id * 17_000_000,  # +17s per doc
        "html": html_bytes,
        "text": text,
        "lang": LANG_CYCLE[doc_id % len(LANG_CYCLE)],
        "_family": fam,
    }


def make_pages(num_docs: int, seed: int = 42, with_dups: bool = True,
               doc_id_start: int = 0) -> pa.Table:
    """Build a pages table for doc_ids [doc_id_start, doc_id_start+num_docs).

    ~3% duplicate rows: every doc_id % 33 == 0 re-emits the same url with a
    later warc_ts and slightly different html; dedup (D1) must keep the
    later row. Row order: ascending doc_id, dup immediately after original.
    """
    rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}

    def push(d: dict) -> None:
        for k in rows:
            rows[k].append(d[k])

    for doc_id in range(doc_id_start, doc_id_start + num_docs):
        d = render_doc(doc_id, seed)
        push(d)
        if with_dups and doc_id % 33 == 0 and d["_family"] not in ("bad",):
            dup = render_doc(doc_id, seed ^ 0x5EED)  # different content
            dup["url"] = d["url"]                    # same key
            dup["warc_ts"] = d["warc_ts"] + 3_600_000_000  # +1h: later wins
            push(dup)
    arrays = [
        pa.array(rows["url"], pa.string()),
        pa.array(rows["warc_ts"], pa.timestamp("us")),
        pa.array(rows["html"], pa.binary()),
        pa.array(rows["text"], pa.string()),
        pa.array(rows["lang"], pa.string()),
    ]
    return pa.Table.from_arrays(arrays, schema=S.PAGES)


def make_reviews(model_results: pa.Table, seed: int = 42) -> pa.Table:
    """Synthetic human-review answers covering ~70% of route=="review" rows
    (FIXTURES.md §5). Deterministic per url; worker_id = "w" + hash%1000."""
    urls = model_results.column("url").to_pylist()
    routes = model_results.column("route").to_pylist()
    out = {k: [] for k in ("url", "date", "total", "vendor", "worker_id", "answered_ts")}
    for url, route in zip(urls, routes):
        if route != "review":
            continue
        h = _stable_hash(url)
        if h % 10 >= 7:  # ~30% stay pending (timeout analogue)
            continue
        rng = random.Random(seed ^ h)
        out["url"].append(url)
        out["date"].append(DATE_FORMATS[h % len(DATE_FORMATS)](rng))
        out["total"].append(f"{rng.randint(100, 9999) / 100.0:.2f}")
        out["vendor"].append(rng.choice(VENDORS))
        out["worker_id"].append(f"w{h % 1000:03d}")
        out["answered_ts"].append(EPOCH_US + 30 * 86_400_000_000 + (h % 1000) * 1_000_000)
    return pa.Table.from_pydict(out, schema=S.REVIEWS)


def _stable_hash(s: str) -> int:
    """Deterministic 63-bit string hash (FNV-1a); Python's hash() is salted
    per process so it is forbidden here."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h >> 1


def write_pages_parquet(out_dir: str, num_docs: int, seed: int = 42,
                        rows_per_file: int = 20_000) -> str:
    """Materialize a pages corpus as a directory of parquet files, generated
    in parallel via Ray (generation scales with the corpus). Returns out_dir.

    Files are sharded deterministically by doc_id range so output layout is
    independent of scheduling, and written atomically (tmp then rename).
    """
    import os

    import pyarrow.parquet as pq
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _write_shard(shard_id: int, start: int, count: int) -> int:
        t = make_pages(count, seed=seed, doc_id_start=start)
        tmp = os.path.join(out_dir, f".part-{shard_id:05d}.parquet.tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out_dir, f"part-{shard_id:05d}.parquet"))
        return t.num_rows

    futs = []
    shard = 0
    for start in range(0, num_docs, rows_per_file):
        futs.append(_write_shard.remote(shard, start, min(rows_per_file, num_docs - start)))
        shard += 1
    ray.get(futs)
    return out_dir
