"""Heavy randomized shake of every round-5 reader: N seeded mutations
per format (truncations, bit flips, byte splices, random noise) —
every parse must return data or raise a catchable exception quickly;
no hangs, no interpreter-level crashes.  The in-suite tests cover
~50 mutations per format; this is the 2000-per-format soak arm,
mirroring the container-demux shake the round-4 verdict asked for.

Usage: PYTHONPATH=/root/repo python scripts/format_fuzz_shake.py [N]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def mutations(rng: random.Random, base: bytes, n: int):
    for _ in range(n):
        kind = rng.randrange(4)
        if kind == 0:  # truncate
            yield base[:rng.randrange(len(base) + 1)]
        elif kind == 1:  # bit flips
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            yield bytes(mut)
        elif kind == 2:  # splice two fixtures
            cut = rng.randrange(len(base))
            yield base[:cut] + base[cut:][::-1]
        else:  # random noise with the right magic prefix
            yield base[:rng.randrange(0, min(64, len(base)))] + bytes(
                rng.getrandbits(8) for _ in range(rng.randrange(400)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from webxtract.ops.csvtext import fixture_csv, parse_csv
    from webxtract.ops.docx import fixture_docx, probe_docx
    from webxtract.ops.epub import epub_chapters, fixture_epub
    from webxtract.ops.exif import fixture_exif, probe_exif
    from webxtract.ops.ical import fixture_ics, parse_ics
    from webxtract.ops.mime import fixture_email, parse_email
    from webxtract.ops.office import (fixture_odt, fixture_rtf,
                                      odt_paragraphs, rtf_text)
    from webxtract.ops.pdf import fixture_pdf, probe_pdf
    from webxtract.ops.pptx import fixture_pptx, pptx_slides
    from webxtract.ops.tarwalk import fixture_tar, parse_tar
    from webxtract.ops.tiffcodec import decode_tiff, fixture_tiff
    from webxtract.ops.xlsx import fixture_xlsx, xlsx_cells

    def wrap(fn):
        def run(data: bytes) -> None:
            try:
                fn(data)
            except Exception:  # noqa: BLE001 — degradation is data
                pass

        return run

    parts = [
        ("pdf", fixture_pdf, wrap(probe_pdf)),
        ("exif", fixture_exif, wrap(probe_exif)),
        ("tiff", fixture_tiff, wrap(decode_tiff)),
        ("docx", fixture_docx, wrap(probe_docx)),
        ("odt", fixture_odt, wrap(odt_paragraphs)),
        ("rtf", fixture_rtf, wrap(rtf_text)),
        ("xlsx", fixture_xlsx, wrap(xlsx_cells)),
        ("pptx", fixture_pptx, wrap(pptx_slides)),
        ("epub", fixture_epub, wrap(epub_chapters)),
        ("email", fixture_email, wrap(parse_email)),
        ("csv", fixture_csv,
         wrap(lambda b: parse_csv(b.decode("utf-8", "replace")))),
        ("tar", fixture_tar, wrap(parse_tar)),
        ("ics", fixture_ics, wrap(parse_ics)),
    ]
    for name, fixture, run in parts:
        rng = random.Random(hash(name) & 0xFFFF)
        t0 = time.monotonic()
        count = 0
        for base_i in (0, 1, 7):
            base = fixture(base_i)
            for mut in mutations(rng, base, n // 3 + 1):
                run(mut)
                count += 1
        dt = time.monotonic() - t0
        print(json.dumps({"part": name, "mutations": count,
                          "sec": round(dt, 1),
                          "per_s": round(count / dt)}), flush=True)


if __name__ == "__main__":
    main()
