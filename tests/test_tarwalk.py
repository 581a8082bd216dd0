"""tar walker (ops/tarwalk.py): stdlib cross-checks both directions,
checksum verification, prefix split, gzip member, hostile input."""

import io
import tarfile

import pytest

from webxtract.ops.tarwalk import build_tar, fixture_tar, parse_tar


def test_stdlib_reads_ours_plain_and_gzip():
    for i in (0, 1, 7):
        data = fixture_tar(i)
        mode = "r:gz" if i % 2 else "r"
        tf = tarfile.open(fileobj=io.BytesIO(data), mode=mode)
        ours = parse_tar(data)
        assert tf.getnames() == [m["name"] for m in ours]
        for m in ours:
            assert tf.extractfile(m["name"]).read() == m["payload"]


def test_we_read_stdlib_tar():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tw:
        for name, payload in [("a.txt", b"alpha"),
                              ("deep/dir/b.bin", bytes(range(100)))]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tw.addfile(info, io.BytesIO(payload))
    ms = parse_tar(buf.getvalue())
    assert [(m["name"], m["payload"]) for m in ms] == [
        ("a.txt", b"alpha"), ("deep/dir/b.bin", bytes(range(100)))]


def test_prefix_split_roundtrip():
    long_name = "p" * 80 + "/" + "q" * 60 + "/f.txt"
    data = build_tar([(long_name, b"x")])
    assert parse_tar(data)[0]["name"] == long_name
    # stdlib agrees on the rejoined path
    tf = tarfile.open(fileobj=io.BytesIO(data))
    assert tf.getnames() == [long_name]


def test_checksum_verified():
    data = bytearray(build_tar([("a.txt", b"payload")]))
    data[0] ^= 0xFF  # corrupt the name -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(data))


def test_gzip_crc_verified():
    data = bytearray(fixture_tar(1))  # gzip arm
    data[-10] ^= 0xFF  # corrupt compressed stream near the tail
    with pytest.raises(Exception):
        parse_tar(bytes(data))


def test_padding_and_terminator():
    data = build_tar([("odd.txt", b"x" * 513)])  # crosses a block
    ms = parse_tar(data)
    assert ms[0]["size"] == 513
    assert len(data) % 512 == 0


def test_truncation_never_hangs():
    data = fixture_tar(4)
    for cut in range(0, len(data), max(1, len(data) // 19)):
        try:
            parse_tar(data[:cut])
        except Exception:  # noqa: BLE001 — degradation is data
            pass
