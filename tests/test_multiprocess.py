"""True multi-process (jax.distributed) execution: 2 OS processes x 4
virtual CPU devices form ONE 8-device global mesh (gloo cross-process
collectives), run the full BatchedSndEnv program on a globally-sharded
batch, and the gathered result equals a single-process run. The corpus
path shards files per process and rank 0 merges manifests + raw moment
stats. This is the DCN half of SURVEY.md section 5's scaling model (the
reference has no distributed anything); the worker logic lives in
tools/mp_worker.py so it can also run standalone."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_worker.py")
NPROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_run(tmp_path_factory):
    """Launch the 2-process fabric once; several tests inspect its
    artifacts (the run takes ~1 min of compile on cold CPU caches)."""
    workdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    env = dict(os.environ)
    # the workers configure their own backend (4 CPU devices + gloo);
    # drop anything the test process' conftest exported
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(NPROC), str(port),
             workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for rank in range(NPROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    return workdir, outs


def test_two_process_global_mesh_certifies(mp_run):
    """Each rank's self-certification: global mesh spans both processes,
    gathered sharded outputs equal the single-process run, and the
    cross-process feature-stats all-reduce matches."""
    workdir, outs = mp_run
    assert "dryrun_multiprocess OK: 2 processes x 4 devices" in outs[0]
    for rank in range(NPROC):
        with open(os.path.join(workdir, f"rank{rank}.json")) as f:
            rec = json.load(f)
        assert rec["nproc"] == NPROC and rec["devices"] == 8
        assert rec["max_dev"] <= 3e-5
        assert rec["stats_dev"] <= 2e-5
        assert rec["digest_guard_ok"]  # drifted path list refused
        # multi-host CP: the long utterance's segment axis spanned both
        # processes and gathered == single-process
        assert rec["cp_segments"] == 16 and rec["cp_dev"] <= 3e-5
    # the file shard split covered all 5 corpus files between the ranks
    done = [
        json.load(open(os.path.join(workdir, f"rank{r}.json")))[
            "corpus_files_done"
        ]
        for r in range(NPROC)
    ]
    assert sum(done) == 5 and all(d > 0 for d in done)


def test_distributed_corpus_matches_single_process(mp_run, tmp_path):
    """The rank-0-merged corpus artifacts (features, manifest, f64 moment
    stats) equal a single-process CorpusRunner run over the same files."""
    import jax.numpy as jnp

    from auditory_tpu.config import (
        GaborSet,
        SndEnvConfig,
        default_gabor_specs,
    )
    from auditory_tpu.pipeline.batch import CorpusRunner

    workdir, _ = mp_run
    corpus = os.path.join(workdir, "corpus")
    merged = os.path.join(workdir, "features")
    paths = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".wav")
    )
    assert len(paths) == 5

    cfg = SndEnvConfig(
        gabor=GaborSet(
            size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
            specs=default_gabor_specs(phases=(0.0, 1.5708)),
        )
    )
    ref_dir = str(tmp_path / "ref")
    CorpusRunner(cfg, 16000, batch_size=4, dtype=jnp.float32).run(
        paths, ref_dir
    )

    ref_npz = sorted(f for f in os.listdir(ref_dir) if f.endswith(".npz"))
    got_npz = sorted(f for f in os.listdir(merged) if f.endswith(".npz"))
    assert got_npz == ref_npz and len(ref_npz) == 5
    for f in ref_npz:
        a = dict(np.load(os.path.join(merged, f)))
        b = dict(np.load(os.path.join(ref_dir, f)))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(
                a[k].astype(np.float64), b[k].astype(np.float64),
                atol=1e-2, rtol=1e-2, err_msg=f"{f}:{k}",
            )

    # manifest: same ok set
    def ok_set(path):
        out = set()
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec.get("status") == "ok":
                    out.add(os.path.basename(rec["path"]))
        return out

    assert ok_set(os.path.join(merged, "manifest.jsonl")) == ok_set(
        os.path.join(ref_dir, "manifest.jsonl")
    )

    # corpus-wide moment stats: exact f64 sums -> near-identical
    with open(os.path.join(merged, "feature_stats.json")) as f:
        a = json.load(f)
    with open(os.path.join(ref_dir, "feature_stats.json")) as f:
        b = json.load(f)
    assert a["count_steps"] == b["count_steps"]
    # the shard runs batch the files differently (3+2 vs 4+1), so the f32
    # on-device moment partials accumulate in a different order before the
    # f64 fold -- a few-ulp-of-f32 difference, nothing more
    np.testing.assert_allclose(a["mel_mean"], b["mel_mean"], rtol=1e-4)
    np.testing.assert_allclose(a["mel_std"], b["mel_std"], rtol=1e-3)


def test_cli_corpus_distributed(tmp_path):
    """`cli corpus --coordinator` drives the live multi-process path: two
    CLI processes split the files by rank and rank 0 merges automatically
    (no corpus-merge step)."""
    from auditory_tpu.io.wav import float_to_wave, write_wav
    from tests.conftest import tone

    corpus = tmp_path / "wavs"
    corpus.mkdir()
    for i in range(4):
        write_wav(str(corpus / f"u{i}.wav"),
                  float_to_wave(tone(400.0 + 90 * i, 0.25, 16000), 16000))
    out = tmp_path / "feats"
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["AUDITORY_TPU_CPU_DEVICES"] = "2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "auditory_tpu.cli", "corpus",
             "--glob", str(corpus / "*.wav"), "--out", str(out),
             "--batch-size", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=600)[0])
        except subprocess.TimeoutExpired:
            # kill the sibling too: a wedged coordinator handshake blocks
            # BOTH ranks, and a leaked process would pollute the session
            for q in procs:
                q.kill()
            raise
    for rank, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank}:\n{o[-3000:]}"
    assert '"merged"' in outs[0] and '"merged"' not in outs[1]
    assert sorted(f for f in os.listdir(out) if f.endswith(".npz")) == [
        f"u{i}.npz" for i in range(4)
    ]
    assert (out / "manifest.jsonl").exists()
    assert (out / "feature_stats.json").exists()

    # flag validation: --shard conflicts; bad rank refused
    from auditory_tpu.cli import main as cli_main

    assert cli_main(["corpus", "--glob", str(corpus / "*.wav"),
                     "--out", str(out), "--coordinator", "x:1",
                     "--shard", "0/2", "--num-processes", "2",
                     "--process-id", "0"]) == 2
    assert cli_main(["corpus", "--glob", str(corpus / "*.wav"),
                     "--out", str(out), "--coordinator", "x:1",
                     "--num-processes", "2", "--process-id", "5"]) == 2
    # --mesh would build a GLOBAL mesh for per-rank local corpus runs:
    # refused (non-addressable placement / desynchronized collectives)
    assert cli_main(["corpus", "--glob", str(corpus / "*.wav"),
                     "--out", str(out), "--coordinator", "x:1", "--mesh",
                     "--num-processes", "2", "--process-id", "0"]) == 2
