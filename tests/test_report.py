"""Run-report generator (tools/report.py): summary + markdown from JSONL."""
import json

from dgn_tpu.tools.report import load_epochs, summarize, to_markdown


def _write_stream(path, n=30, maximize=False):
    rows = []
    for e in range(n):
        val = (0.5 + e * 0.01) if maximize else (1.0 / (e + 1) + 0.02)
        key = "roc_auc" if maximize else "mae"
        rec = {"t": e * 2.0, "kind": "epoch", "epoch": e,
               "lr": 1e-3 * (0.5 ** (e // 10)),
               "train": {"loss": val, key: val * 0.9,
                         "objective": val},
               "val": {"loss": val, key: val, "objective": val},
               "test": {"loss": val, key: val * 1.1, "objective": val},
               "seconds": 700.0 if e == 0 else 3.0,
               "edges_per_s": 1e6, "edge_padding_efficiency": 0.9}
        rows.append(rec)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"kind": "other"}) + "\n")  # non-epoch rec skipped


def test_summarize_minimized_metric(tmp_path):
    p = tmp_path / "m.jsonl"
    _write_stream(str(p), n=30)
    rows = load_epochs(str(p))
    assert len(rows) == 30
    s = summarize(rows)
    assert s["metric"] == "mae"
    assert s["best_epoch"] == 29          # mae decreasing -> last is best
    assert s["epochs"] == 30
    assert s["epoch_seconds_median"] == 3.0          # compile epoch excluded
    assert s["lr_steps"][0] == {"epoch": 10, "lr": 5e-4}
    md = to_markdown(s, "t")
    assert "best val" in md and "| epoch |" in md


def test_summarize_maximized_metric(tmp_path):
    p = tmp_path / "m.jsonl"
    _write_stream(str(p), n=12, maximize=True)
    s = summarize(load_epochs(str(p)))
    assert s["metric"] == "roc_auc"
    assert s["best_epoch"] == 11          # roc_auc increasing -> last is best
    assert s["test_at_best_val"] is not None


def test_summarize_without_val_split(tmp_path):
    """Runs without a val loader write "val": null (trainer.fit) — the report
    must fall back to train keys instead of iterating None (ADVICE r2)."""
    p = tmp_path / "m.jsonl"
    _write_stream(str(p), n=8)
    rows = load_epochs(str(p))
    for r in rows:
        r["val"] = None
    s = summarize(rows)
    assert s["metric"] == "mae"
    assert s["best_val"] is None
    assert s["best_epoch"] == rows[-1]["epoch"]   # no val -> final epoch
    to_markdown(s, "noval")  # must not raise


def test_curve_no_duplicate_final_row(tmp_path):
    """When len(rows)-1 is a stride multiple, the strided sample already ends
    on the last epoch — it must not be appended twice (ADVICE r2)."""
    p = tmp_path / "m.jsonl"
    _write_stream(str(p), n=25)  # stride=2, 24 % 2 == 0
    s = summarize(load_epochs(str(p)))
    epochs = [pt["epoch"] for pt in s["curve"]]
    assert epochs[-1] == 24
    assert len(epochs) == len(set(epochs))
