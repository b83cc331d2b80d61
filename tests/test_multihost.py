"""Two-process "multi-host" execution on CPU (VERDICT r2 item 4).

Spawns 2 subprocesses with torchrun-style env (MASTER_ADDR/MASTER_PORT/
WORLD_SIZE/RANK — the reference's env bootstrap, training/
distributed.py:12-144), each with 4 forced CPU devices, forming an 8-device
global mesh. Each rank runs tests/_multihost_worker.py: init_distributed ->
one sharded tri train step (cross-process gathered InfoNCE + sync-BN) ->
metric merge via process_allgather -> broadcast/all_gather_object.

Skipped (not failed) if the coordinator can't bind or gloo collectives are
unavailable in this jax build.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(rank: int, port: int, ckpt_dir: str = "") -> dict:
    env = dict(os.environ)
    if ckpt_dir:
        env["MULTIHOST_CKPT_DIR"] = ckpt_dir
    # CPU-only jax: drop the axon TPU site hook (two ranks must not contend
    # for the single tunnel chip) and force 4 host devices per process
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = REPO_ROOT
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["MASTER_ADDR"] = "127.0.0.1"
    env["MASTER_PORT"] = str(port)
    env["WORLD_SIZE"] = "2"
    env["RANK"] = str(rank)
    return env


def test_two_process_mesh_step_and_metric_merge(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / "mh_ckpt")  # shared across both ranks
    # stdout/stderr to FILES, never pipes (CLAUDE.md): the jax/orbax INFO
    # flood fills a 64K pipe while this process drains ranks sequentially,
    # blocking the chatty rank mid-collective and deadlocking the pair
    outfs = [tmp_path / f"w_out_{r}.txt" for r in range(2)]
    errfs = [tmp_path / f"w_err_{r}.txt" for r in range(2)]
    handles = [(open(o, "w"), open(e, "w")) for o, e in zip(outfs, errfs)]
    procs = [
        subprocess.Popen([sys.executable, WORKER],
                         env=_worker_env(r, port, ckpt_dir),
                         cwd=REPO_ROOT, stdout=ho, stderr=he)
        for r, (ho, he) in zip(range(2), handles)
    ]
    outs = []
    try:
        for p, o, e in zip(procs, outfs, errfs):
            p.wait(timeout=420)
            outs.append((p.returncode, o.read_text(), e.read_text()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-host workers timed out (coordinator/gloo "
                    "unavailable in this environment)")
    finally:
        for ho, he in handles:
            ho.close()
            he.close()

    for rc, out, err in outs:
        if rc != 0 and ("UNAVAILABLE" in err or "failed to connect" in err
                        or "Address already in use" in err
                        or "DEADLINE_EXCEEDED" in err):
            # env-slowness (gloo handshake timeout under load), not a bug
            pytest.skip(f"distributed runtime unavailable: {err[-400:]}")
        assert rc == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"

    results = []
    for rc, out, err in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert line, out
        results.append(json.loads(line[0].split(" ", 1)[1]))

    r0, r1 = sorted(results, key=lambda r: r["rank"])
    assert r0["rank"] == 0 and r1["rank"] == 1
    # both ranks computed the SAME global loss/grad over the sharded batch
    assert r0["loss"] == pytest.approx(r1["loss"], abs=1e-5)
    assert r0["grad_norm"] == pytest.approx(r1["grad_norm"], abs=1e-5)
    assert r0["grad_norm"] > 0
    # metric merge and object collectives agree across ranks
    assert r0["accuracy"] == pytest.approx(r1["accuracy"])
    assert r0["bcast"] == r1["bcast"] == "ckpt-from-rank-0"
    assert r0["gather"] == r1["gather"] == [0, 1]
    # collective sharded checkpoint round-trip (cross-process FSDP shards)
    assert r0["ckpt_roundtrip"] is True and r1["ckpt_roundtrip"] is True


def _run_cli_pair(tmp_path, extra, port):
    cmd = [sys.executable, "-m", "vitlens_tpu.cli.train",
           "--modality", "eeg", "--model", "ViT-Tiny-Test",
           "--dataset-type", "synthetic", "--train-data", "synthetic",
           "--train-num-samples", "16", "--batch-size", "2",
           "--warmup", "1", "--precision", "fp32", "--n-tower", "3",
           "--fsdp", "--save-frequency", "1", "--save-most-recent",
           "--log-every-n-steps", "1",
           "--logs", str(tmp_path), "--name", "mh"] + extra
    # stderr to files, not pipes: an undrained pipe blocks a rank mid-run
    # (64K buffer), deadlocking the other rank inside a collective
    errfs = [tmp_path / f"cli_err_{r}.txt" for r in range(2)]
    handles = [open(f, "w") for f in errfs]
    procs = [subprocess.Popen(cmd, env=_worker_env(r, port), cwd=REPO_ROOT,
                              stdout=subprocess.DEVNULL, stderr=h)
             for r, h in zip(range(2), handles)]
    outs = []
    try:
        for p, f in zip(procs, errfs):
            p.wait(timeout=420)
            outs.append((p.returncode, "", f.read_text()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-host CLI workers timed out")
    finally:
        for h in handles:
            h.close()
    for rc, out, err in outs:
        if rc != 0 and ("UNAVAILABLE" in err or "failed to connect" in err
                        or "Address already in use" in err
                        or "DEADLINE_EXCEEDED" in err):
            # env-slowness (gloo handshake timeout under load), not a bug
            pytest.skip(f"distributed runtime unavailable: {err[-400:]}")
        assert rc == 0, f"CLI rank failed:\nstdout={out}\nstderr={err[-3000:]}"
    return outs


def test_two_process_cli_fsdp_train_save_resume(tmp_path):
    """Full train CLI, 2 processes, --fsdp: cross-process-sharded state
    checkpoints through the collective orbax path (cli/train.py
    can_snapshot=False branch) and a second run resumes it through the
    deferred sharded-resume branch. This drives the exact driver code no
    single-process test can reach."""
    run_dir = tmp_path / "mh"
    _run_cli_pair(tmp_path, ["--epochs", "1"], _free_port())
    ckpts = run_dir / "checkpoints"
    assert (ckpts / "epoch_1").exists()
    # sharded saves record latest via a pointer file, not a full copy
    from vitlens_tpu.train import checkpoint as C

    assert C.get_latest_checkpoint(str(ckpts)).endswith("epoch_1")
    meta = json.loads((ckpts / "epoch_1" / "meta.json").read_text())
    assert meta.get("sharded") is True
    # rank0 owns out.log; rank1 logged to its own file (no interleaving)
    assert (run_dir / "out.log").exists()
    assert (run_dir / "out.rank1.log").exists()
    rec = json.loads(
        (run_dir / "results.jsonl").read_text().splitlines()[-1])
    import numpy as np
    assert np.isfinite(rec["train/loss"])

    _run_cli_pair(tmp_path, ["--epochs", "2", "--resume", "latest"],
                  _free_port())
    log = (run_dir / "out.log").read_text()
    assert "resumed (sharded) from" in log, log[-2000:]
    assert (ckpts / "epoch_2").exists()


def test_two_process_cli_eval_sharded_over_global_mesh(tmp_path):
    """In-training eval on a mesh that SPANS processes (cli/train.py
    evaluate): encode batches are assembled with
    make_array_from_callback over the global data axis and feature
    outputs land replicated (out_shardings) so every rank can fetch them
    — the np.asarray-on-non-addressable crash this guards against only
    exists cross-process, which no single-host test can reach."""
    import numpy as np
    from PIL import Image

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rows = ["filepath\ttitle"]
    for i in range(8):
        p = imgs / f"{i}.jpg"
        Image.fromarray((np.random.RandomState(i).rand(64, 64, 3) * 255
                         ).astype(np.uint8)).save(p)
        rows.append(f"{p}\ta photo number {i}")
    data = tmp_path / "data.tsv"
    data.write_text("\n".join(rows) + "\n")

    run_dir = tmp_path / "mh"
    _run_cli_pair(tmp_path, [
        "--modality", "image", "--force-image-size", "224",
        "--dataset-type", "csv", "--train-data", str(data),
        "--val-data", str(data), "--csv-separator", "\t",
        "--batch-size", "4", "--epochs", "1", "--val-frequency", "1",
        "--n-tower", "2", "--align-to", "clip",
        "--no-lock-image", "--no-lock-text",
    ], _free_port())
    rec = json.loads(
        (run_dir / "results.jsonl").read_text().splitlines()[-1])
    assert "val/data.tsv/image_to_text_R@1" in rec
    assert np.isfinite(rec["val/data.tsv/clip_val_loss"])


def test_init_distributed_refuses_worldsize_without_addr(monkeypatch):
    """WORLD_SIZE>1 with no MASTER_ADDR/COORDINATOR_ADDRESS must raise,
    not silently run N independent single-host jobs (duplicated data,
    clobbered checkpoints)."""
    from vitlens_tpu.parallel.mesh import init_distributed

    for var in ("MASTER_ADDR", "MASTER_PORT", "COORDINATOR_ADDRESS",
                "SLURM_NTASKS", "SLURM_PROCID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "0")
    with pytest.raises(RuntimeError, match="MASTER_ADDR"):
        init_distributed()


def test_init_distributed_slurm_uses_auto_detection(monkeypatch):
    """A standard sbatch launch (SLURM_NTASKS>1, no COORDINATOR_ADDRESS)
    must reach jax.distributed's SlurmCluster auto-detection — NOT raise
    up-front — and surface an actionable error only if auto-detect fails."""
    import jax
    from vitlens_tpu.parallel import mesh as M

    for var in ("MASTER_ADDR", "COORDINATOR_ADDRESS", "WORLD_SIZE", "RANK"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "0")

    calls = []

    def fake_initialize(*a, **kw):
        calls.append((a, kw))
        raise RuntimeError("Could not find coordinator address")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    with pytest.raises(RuntimeError, match="COORDINATOR_ADDRESS"):
        M.init_distributed()
    # auto-detection WAS attempted (argless initialize), not skipped
    assert calls == [((), {})]

    # plugin failures are not always RuntimeError — nodelist parsing can
    # raise ValueError/KeyError (advisor r4); those must get the SAME
    # actionable hint, not propagate raw
    def fake_initialize_ve(*a, **kw):
        raise ValueError("could not parse SLURM_STEP_NODELIST")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize_ve)
    with pytest.raises(RuntimeError, match="COORDINATOR_ADDRESS"):
        M.init_distributed()
