"""train_run_receipt: distill logs/metrics.jsonl + main logs into the
committed receipt JSON (the on-chip training evidence bench.py embeds)."""

import json

from linnaeus_tpu.tools.train_run_receipt import build_receipt, main


def _write_run(d, n_steps=40, resume_at=None):
    logs = d / "logs"
    logs.mkdir(parents=True)
    with open(logs / "metrics.jsonl", "w") as f:
        for s in range(10, n_steps + 1, 10):
            f.write(json.dumps({
                "step": s, "train/loss": 21.0 - 0.1 * s, "train/lr": 1e-3,
            }) + "\n")
        f.write(json.dumps({
            "step": n_steps, "val/loss": 15.0, "val/acc1/taxa_L10": 0.31,
            "val/chain_accuracy": 0.2,
        }) + "\n")
    lines = [
        "[ts] (loop.py:236) INFO: Model params: 30,365,661",
        "[ts] (loop.py:991) INFO: epoch 0 done: 1280 samples in 20.0s "
        "(64.0 img/s)",
        "[ts] (checkpoint.py:106) INFO: Saved checkpoint at step 20 -> /x",
        "[ts] (loop.py:991) INFO: epoch 1 done: 1280 samples in 10.0s "
        "(128.0 img/s)",
        "[ts] (checkpoint.py:106) INFO: Saved checkpoint at step 40 -> /x",
    ]
    if resume_at is not None:
        lines.insert(3, f"[ts] (loop.py:776) INFO: Resumed from /x/ckpt "
                        f"at step {resume_at}")
    (logs / "main_p0.log").write_text("\n".join(lines) + "\n")


def test_receipt_fields(tmp_path):
    _write_run(tmp_path, resume_at=20)
    r = build_receipt(str(tmp_path))
    assert r["loss_first"] == 20.0 and r["loss_last"] == 17.0
    assert r["steps"] == 40
    assert r["model_params"] == 30365661
    assert [e["img_per_sec"] for e in r["epochs"]] == [64.0, 128.0]
    # steady-state throughput excludes the compile-heavy first epoch
    assert r["img_per_sec_steady"] == 128.0
    assert r["resumes"] == [{"checkpoint": "/x/ckpt", "step": 20}]
    assert r["checkpoint_saves"] == 2
    v = r["validation"][0]
    assert v["phase"] == "val" and v["loss"] == 15.0
    assert v["acc1/taxa_L10"] == 0.31


def test_curve_downsampled(tmp_path):
    _write_run(tmp_path, n_steps=4000)
    r = build_receipt(str(tmp_path), max_curve_points=50)
    assert len(r["loss_curve"]) <= 51
    # endpoints preserved exactly
    assert r["loss_curve"][0][0] == 10
    assert r["loss_curve"][-1][0] == 4000


def test_cli_writes_out(tmp_path):
    _write_run(tmp_path)
    out = tmp_path / "receipt.json"
    main(["--run-dir", str(tmp_path), "--out", str(out)])
    r = json.loads(out.read_text())
    assert r["steps"] == 40 and r["checkpoint_saves"] == 2
