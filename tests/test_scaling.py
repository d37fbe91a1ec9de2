"""Smoke tests for the scaling/throughput report module (tiny sizes)."""

import numpy as np

from zk_stark_project_tpu.analytics import scaling


def test_bench_ntt_reports_butterflies(np_rng):
    rows = scaling.bench_ntt([4], reps=1, rng=np_rng)
    assert rows[0]["section"] == "ntt"
    assert rows[0]["butterflies_per_s"] > 0
    assert rows[0]["log2_n"] == 4


def test_bench_dntt_efficiency_fields(np_rng):
    rows = scaling.bench_dntt_scaling(6, reps=1, rng=np_rng,
                                      device_counts=[1, 2])
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    assert rows[1]["speedup"] > 0


def test_scaling_cli_writes_csv(tmp_path, monkeypatch):
    out = tmp_path / "rep.csv"
    rc = scaling.main(["--sizes", "4", "--reps", "1", "--lde-log2n", "3",
                       "--blowup", "2", "--width", "4", "--skip-dntt",
                       "--csv", str(out)])
    assert rc == 0
    text = out.read_text()
    assert "ntt" in text and "lde_commit" in text
