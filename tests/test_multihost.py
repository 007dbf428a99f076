"""Multi-host DP readiness (SURVEY.md §2.3 DCN layer): a real 2-process
jax.distributed run over Gloo CPU collectives, plus the loader's
per-process corpus sharding."""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_dp_step():
    """Two OS processes x 2 CPU devices each form one 4-device global mesh
    and agree bit-identically after 2 DP train steps."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # children pick their own platform config before backend init
    env.pop("JAX_PLATFORMS", None)
    script = os.path.join(REPO, "tools", "multihost_smoke.py")
    procs = [subprocess.Popen(
        [sys.executable, script, f"localhost:{port}", "2", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "PROC_OK" in out, out[-2000:]
    # both processes computed the same global losses (replicated result)
    lines = [next(l for l in o.splitlines() if "PROC_OK" in l) for o in outs]
    assert lines[0].split("loss_d=")[1] == lines[1].split("loss_d=")[1]


def test_loader_shards_paths_by_process(tmp_path, monkeypatch):
    """shard_by_process=True: each process decodes only its interleaved
    slice of the sorted corpus (paths[i::n])."""
    from PIL import Image

    from catgen.data import loader

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(10):
        Image.new("RGB", (8, 8), (i, i, i)).save(d / f"{i:03d}.jpg")
    all_paths = loader.scan_paths([str(d)])

    import jax
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    ds = loader.ImageDataset([str(d)], scale=8, source_size=8,
                             shard_by_process=True)
    assert ds.paths == all_paths[1::2]
    assert len(ds) == 5
