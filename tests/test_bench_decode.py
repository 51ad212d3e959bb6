"""Host decode-path benchmark tool (tools/bench_decode, VERDICT r3 #6).

The real numbers are recorded in BASELINE.md "Round-5 decode benchmark"
(full native geometries, this host: ARW2 93 MB/s, CR2 41, NEF 77, DNG
1383 single-thread; tiny --small fixtures measured 77-2243 MB/s); CI
runs the --small smoke to pin the record shape and a pathology floor of
0.5 MB/s — 150x+ under the measured tiny-fixture numbers, so tripping
it means the native path silently fell back to the NumPy reader or
something went quadratic, not that a contended 1-vCPU host was slow."""

import numpy as onp

from eld_tpu.tools.bench_decode import main


def test_bench_decode_smoke(tmp_path):
    records = main(["--small", "--reps", "3", "--threads", "2",
                    "--out", str(tmp_path / "rec.jsonl")])
    assert {r["format"] for r in records} == {"arw", "cr2", "nef", "dng"}
    for rec in records:
        for key in ("decode_ms", "packed_ms", "mb_per_s", "mpix_per_s",
                    "frames_per_s", "mt_mb_per_s"):
            assert onp.isfinite(rec[key]) and rec[key] > 0, (rec["format"], key)
        # packed = decode + pack, so it can't be meaningfully faster; the
        # 0.5x slack absorbs scheduler noise that min-of-reps can't fully
        # remove on a contended 1-vCPU host at --small geometries
        assert rec["packed_ms"] >= 0.5 * rec["decode_ms"], rec
        assert rec["mb_per_s"] > 0.5, rec
    with open(tmp_path / "rec.jsonl") as f:
        assert len(f.readlines()) == 4


def test_bench_decode_explicit_file(tmp_path):
    from tests.tiff_fixture import make_dng

    rng = onp.random.default_rng(3)
    p = tmp_path / "x.dng"
    p.write_bytes(make_dng(rng.integers(512, 16384, (64, 64)).astype(onp.uint16)))
    records = main([str(p), "--reps", "2"])
    assert len(records) == 1 and records[0]["file"] == "x.dng"
    assert records[0]["mosaic_mpix"] == round(64 * 64 / 1e6, 3)
