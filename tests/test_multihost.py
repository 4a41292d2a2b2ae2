"""Multi-host readiness (round-2 verdict missing #5 / SURVEY 2.12).

Launches the full DP train step as 2 processes x 4 virtual CPU devices each
(jax.distributed over a local coordinator, per-process input slices assembled
with make_array_from_process_local_data in parallel/mesh.shard_batch) and
asserts the loss equals the 1-process 8-device run bit-for-bit semantics
(same global batch, same init).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parents[1]

WORKER = """
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
loss = g.dryrun_multichip(8, process_grid=(2, pid, port))
print(f"WORKER_LOSS {{loss:.8f}}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO)))

    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env, cwd=str(REPO))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("WORKER_LOSS")]
        assert line, out[-3000:]
        losses.append(float(line[-1].split()[1]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)

    # single-process 8-virtual-device run of the SAME step+batch
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "loss = g.dryrun_multichip(8)\n"
        "print(f'WORKER_LOSS {loss:.8f}', flush=True)\n"
    )
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env1["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env1, cwd=str(REPO))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    single = float([ln for ln in r.stdout.splitlines() if ln.startswith("WORKER_LOSS")][-1].split()[1])
    assert single == pytest.approx(losses[0], rel=1e-5), (single, losses[0])


def test_trainer_passes_process_sharding(monkeypatch):
    """The trainer's DataLoader receives process_index/process_count and the
    per-process batch is the global batch divided by process_count."""
    import spectrogram_yolov11_tpu.engine.trainer as tr

    captured = {}

    class FakeLoader:
        def __init__(self, ds, batch_size, **kw):
            captured["batch_size"] = batch_size
            captured.update(kw)
            raise RuntimeError("stop-after-capture")

    monkeypatch.setattr(tr, "DataLoader", FakeLoader)
    monkeypatch.setattr(tr.jax, "process_count", lambda: 4)
    monkeypatch.setattr(tr.jax, "process_index", lambda: 3)
    t = tr.BaseTrainer(overrides={"data": "spectrogram_synth.yaml", "batch": 16, "imgsz": 64, "epochs": 1})
    with pytest.raises(RuntimeError, match="stop-after-capture"):
        t.train()
    assert captured["batch_size"] == 4
    assert captured["process_index"] == 3
    assert captured["process_count"] == 4
