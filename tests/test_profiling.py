import json
import time

from rt_tpu.profiling import MetricsLog, ThroughputTimer, mray_per_s


def test_mray_formula():
    # window.rs:317-323: spp * W * H / 1e6 / seconds.
    assert mray_per_s(800, 600, 2, 1.0) == 800 * 600 * 2 / 1e6


def test_throughput_timer():
    t = ThroughputTimer(100, 50)
    t.begin_sweep()
    time.sleep(0.01)
    sweep, cum = t.end_sweep(4)
    assert sweep > 0 and cum > 0
    assert t.total_rays == 4 * 100 * 50


def test_metrics_log(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLog(path)
    log.log(sweep=1, mray=3.5)
    log.log(sweep=2, mray=4.0)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["sweep"] == 1 and "t_wall_s" in lines[0]
    assert lines[1]["mray"] == 4.0


def test_progress_bar_renders_and_completes():
    import io

    from rt_tpu.profiling import ProgressBar

    buf = io.StringIO()
    bar = ProgressBar(4, stream=buf)
    bar.update(1, "x")
    bar.update(4, "done")
    out = buf.getvalue()
    assert "1/4" in out and "4/4" in out and out.endswith("\n")
