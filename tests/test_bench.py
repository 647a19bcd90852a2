"""bench.py helpers: the reference-structured baseline must be a faithful
proxy (host ICP actually aligns; synthetic batches match the eval layout).
The headline paths themselves run on the chip (driver + verify recipe)."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast  # core tier: `pytest -m fast` (<5 min warm)


def test_host_icp_aligns_rotated_cloud():
    """bench._host_icp reimplements the reference algorithm
    (utils/icp.py:68-118); it must recover a rigid transform."""
    bench = pytest.importorskip("bench")
    rng = np.random.RandomState(0)
    a = rng.rand(256, 3).astype(np.float64)
    theta = 0.3
    rot = np.array(
        [[np.cos(theta), -np.sin(theta), 0.0],
         [np.sin(theta), np.cos(theta), 0.0],
         [0.0, 0.0, 1.0]]
    )
    b = a @ rot.T + np.array([0.05, -0.02, 0.1])
    t = bench._host_icp(a, b, max_iterations=64, tolerance=1e-12)
    aligned = a @ t[:3, :3].T + t[:3, 3]
    err = np.linalg.norm(aligned - b, axis=1).mean()
    assert err < 1e-3, err


def test_synthetic_eval_batches_layout():
    bench = pytest.importorskip("bench")
    batches = bench._synthetic_eval_batches(n_cats=2, samples_per_cat=10,
                                            batch=8)
    assert len(batches) == 4  # 2 cats x ceil(10/8)
    img, pts = batches[0]
    assert img.shape == (8, 128, 128, 3) and img.dtype == np.uint8
    assert pts.shape == (8, 1024, 3) and pts.dtype == np.float32
    assert batches[1][0].shape[0] == 2  # 10 = 8 + 2
    # clouds live in [0, 0.9): the EMD contract wants [0,1]-normalized input
    assert 0.0 <= pts.min() and pts.max() < 0.9


def test_record_compact_line_under_700_bytes(tmp_path, capsys):
    """The driver keeps only a stdout tail; every emitted headline line must
    be small, parseable, and self-contained (round-3 lesson: BENCH_r03
    parsed: null because one giant line was truncated). Uses the FULL
    round-5 scalar set."""
    import json

    bench = pytest.importorskip("bench")
    rec = bench._Record(str(tmp_path / "detail.json"),
                        ["eval", "train", "serving", "stages"])
    rec.value = 356.123
    rec.vs_baseline = 123.456
    rec.scalars.update(
        link_mbps=23.4, vs_baseline_mean=612.345,
        compute_only_ips=477.0, train_ips=132.5, train_vs_base=1.473,
        sinkhorn_ips=1234.5, finetune_ips=118.234,
        serving_ips=21123.4, serving_bf16_ips=27719.9, artifact_ips=20111.2,
    )
    rec.detail["eval"] = {"huge": "x" * 10000}  # goes to the file only
    rec.done = ["eval", "train", "serving", "stages"]
    rec.emit(partial=False)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(out.encode()) < 700, len(out.encode())
    parsed = json.loads(out)
    assert parsed["value"] == 356.123
    assert parsed["vs_baseline"] == 123.456
    assert parsed["partial"] is False
    assert "detail" not in parsed
    full = json.loads((tmp_path / "detail.json").read_text())
    assert full["detail"]["eval"]["huge"].startswith("x")


def test_record_skipped_sections_never_claim_complete(tmp_path, capsys):
    """Budget-skipped sections go to sections_skipped and keep the final
    record partial (round-4 lesson: a budget-starved run once reported all
    4 sections 'done' with partial=false, hiding that train/serving/stages
    never measured anything)."""
    import json

    bench = pytest.importorskip("bench")
    rec = bench._Record(str(tmp_path / "d.json"),
                        ["eval", "train", "serving", "stages"])
    rec.value = 300.0
    rec.vs_baseline = 100.0
    rec.done.append("eval")
    rec.skipped.extend(["train", "serving", "stages"])
    rec.emit(partial=False)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed["partial"] is True
    assert parsed["sections_done"] == ["eval"]
    assert parsed["sections_skipped"] == ["train", "serving", "stages"]
    assert len(out.encode()) < 500


def test_record_partial_emission_sequence(tmp_path, capsys):
    """A run killed mid-way leaves the last line as a valid partial record."""
    import json

    bench = pytest.importorskip("bench")
    rec = bench._Record(str(tmp_path / "d.json"), ["eval", "train"])
    rec.value = 300.0
    rec.vs_baseline = 100.0
    rec.done.append("eval")
    rec.emit()  # partial
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed["partial"] is True
    assert parsed["sections_done"] == ["eval"]
    assert parsed["value"] == 300.0


def test_record_carries_previous_complete_sections(tmp_path):
    """A budget-skipped section must carry the last complete measurement
    forward (stamped with its source commit) instead of erasing it with a
    placeholder (ADVICE r4 #4)."""
    import json

    bench = pytest.importorskip("bench")
    detail = tmp_path / "d.json"
    detail.write_text(json.dumps({
        "commit": "abc1234",
        "detail": {
            "serving": {"images_per_sec_chip": 21123.4, "batch": 512},
            "stages": {"error": "backend flap"},
            "train_stages": {"skipped": "budget"},
        },
    }))
    rec = bench._Record(str(detail), ["eval", "serving", "stages"])
    assert rec.carry("serving") is True
    assert rec.detail["serving"]["images_per_sec_chip"] == 21123.4
    assert rec.detail["serving"]["carried"] is True
    assert rec.detail["serving"]["carried_from_commit"] == "abc1234"
    # errored / skipped sections are NOT carried
    assert rec.carry("stages") is False
    assert rec.carry("train_stages") is False
    assert rec.carry("absent") is False


def test_measured_stats_spread_and_conservative_bound():
    bench = pytest.importorskip("bench")
    ips, wall, n, spread = bench.measured_stats([2.0, 1.0, 4.0], 7.0)
    assert n == 3 and wall == 7.0
    assert abs(ips - 3 / 7.0) < 1e-9
    s = spread["per_sample_seconds"]
    assert (s["min"], s["median"], s["max"]) == (1.0, 2.0, 4.0)
    # conservative bound: every sample as fast as the fastest
    assert spread["ips_upper_bound"] == 1.0
    assert spread["ips_upper_bound"] >= spread["ips_mean"]
