"""Multi-process SPMD worker: one rank of the 2-process CPU test fabric.

Launched N times by ``tests/test_multiprocess.py`` (and usable standalone):

    python tools/mp_worker.py <rank> <nproc> <port> <workdir>

Each rank joins the ``jax.distributed`` coordinator, forms ONE global mesh
over nproc x 4 virtual CPU devices, feeds only its LOCAL batch rows to the
full BatchedSndEnv program (globally sharded, the feature-stats all-reduce
crossing the process boundary via gloo), gathers, and self-certifies the
result against an unsharded single-process run of the same program. Then it
runs the distributed corpus path (per-process file shards + rank-0
manifest/stats merge). Writes ``rank<k>.json`` with the deviations and
prints the dryrun-style OK line on rank 0.

This is the DCN half of SURVEY.md section 5's scaling model; the intra-host
half (DP/CP sharding on one process) is __graft_entry__.dryrun_multichip.
"""

import json
import os
import sys

LOCAL_DEVICES = 4


def main() -> None:
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    workdir = sys.argv[4]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from auditory_tpu.parallel.distributed import (
        allgather,
        barrier,
        gather_local_rows,
        initialize,
    )

    initialize(
        f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=rank,
        cpu_test_devices=LOCAL_DEVICES,
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc * LOCAL_DEVICES

    from auditory_tpu.config import (
        GaborSet,
        SndEnvConfig,
        default_gabor_specs,
    )
    from auditory_tpu.io.wav import float_to_wave, write_wav
    from auditory_tpu.parallel.mesh import make_mesh
    from auditory_tpu.pipeline.batch import BatchedSndEnv, CorpusRunner
    from auditory_tpu.pipeline.sndenv import SndEnv

    cfg = SndEnvConfig(
        gabor=GaborSet(
            size_x=9, size_y=9, stride_x=3, stride_y=3, gain=2.0,
            specs=default_gabor_specs(phases=(0.0, 1.5708)),
        )
    )
    sr = 16000
    env = SndEnv(cfg, sr, dtype=jnp.float32, feature_stats=True)
    mesh = make_mesh()  # ALL devices: spans both processes
    n_proc_in_mesh = len({d.process_index for d in mesh.devices.flat})
    assert n_proc_in_mesh == nproc

    # ---- batched SPMD: local rows in, global program, gathered certify ----
    b_global = 6 * nproc  # deliberately NOT a multiple of the device count
    n = env.timing.segment_samples + env.timing.stride_samples  # 2 segments
    rng = np.random.default_rng(42)  # same seed everywhere: shared fixture
    signals = rng.normal(scale=0.1, size=(b_global, n)).astype(np.float32)
    lengths = np.full(b_global, n, dtype=np.int32)
    local = slice(rank * 6, (rank + 1) * 6)

    benv = BatchedSndEnv(env, mesh=mesh)
    res, pad_rows = benv.process_local(signals[local], lengths[local])
    out, seg_valid, stats = res
    # the global batch really is sharded across processes
    own = {d.process_index for d in out.mel_fbank_segment.sharding.device_set}
    assert len(own) == nproc, own
    g_stats = allgather(stats)  # scalars/vectors: no batch rows to trim
    g_mel, g_valid, g_mfcc, g_deltas = gather_local_rows(
        (out.mel_fbank_segment, seg_valid, out.mfcc_segment,
         out.mfcc_deltas),
        local_rows=6, pad_rows=pad_rows,
    )

    ref_out, ref_valid, ref_stats = BatchedSndEnv(env).process(
        signals, lengths
    )
    np.testing.assert_array_equal(g_valid, np.asarray(ref_valid))
    np.testing.assert_allclose(
        g_mel, np.asarray(ref_out.mel_fbank_segment), atol=3e-5, rtol=1e-6
    )
    max_dev = float(
        np.max(np.abs(g_mel - np.asarray(ref_out.mel_fbank_segment)))
    )
    np.testing.assert_allclose(
        g_mfcc, np.asarray(ref_out.mfcc_segment), atol=5e-3, rtol=1e-5
    )
    np.testing.assert_allclose(
        g_deltas, np.asarray(ref_out.mfcc_deltas), atol=5e-3, rtol=1e-5
    )
    # the cross-process all-reduced corpus moments equal the single-process
    # ones (pad rows are inert in the masks)
    stats_dev = 0.0
    for k in ("sum", "sumsq", "count"):
        a, r = np.asarray(g_stats[k]), np.asarray(ref_stats[k])
        np.testing.assert_allclose(a, r, rtol=2e-5, err_msg=k)
        stats_dev = max(
            stats_dev, float(np.max(np.abs(a - r) / np.maximum(np.abs(r), 1)))
        )

    # ---- multi-host CP: one long utterance, segment axis sharded over
    # the GLOBAL mesh (the DCN long-context story; replicated input by
    # contract -- every rank passes the same signal) ----
    long_n = env.timing.segment_samples + env.timing.stride_samples * (
        2 * nproc * LOCAL_DEVICES - 1
    )
    long_sig = np.random.default_rng(11).normal(
        scale=0.1, size=(1, long_n)
    ).astype(np.float32)
    seg_env = BatchedSndEnv(env, mesh=mesh, shard_axis="segment")
    sres, spad = seg_env.process_local(
        long_sig, np.array([long_n], dtype=np.int32)
    )
    sout, sv, _sstats = sres
    assert spad == 0
    n_seg = sout.mel_fbank_segment.shape[1]
    assert n_seg == 2 * nproc * LOCAL_DEVICES
    # device_set spans the whole mesh even for replicated outputs, so
    # certify the DISTRIBUTION: the spec names the mesh axis on the
    # segment dim and each local shard holds only its slice of segments
    sspec = sout.mel_fbank_segment.sharding.spec
    assert tuple(sspec)[:2] == (None, "data"), sspec
    local_seg = sout.mel_fbank_segment.addressable_shards[0].data.shape[1]
    assert local_seg == n_seg // (nproc * LOCAL_DEVICES), (
        local_seg, n_seg
    )
    gs_mel = allgather(sout.mel_fbank_segment)
    sref, _srv, _ = BatchedSndEnv(env).process(
        long_sig, np.array([long_n], dtype=np.int32)
    )
    np.testing.assert_allclose(
        gs_mel, np.asarray(sref.mel_fbank_segment), atol=3e-5, rtol=1e-6
    )
    cp_dev = float(
        np.max(np.abs(gs_mel - np.asarray(sref.mel_fbank_segment)))
    )

    # ---- distributed corpus: per-process file shards, rank-0 merge ----
    corpus = os.path.join(workdir, "corpus")
    out_dir = os.path.join(workdir, "features")
    if rank == 0:
        os.makedirs(corpus, exist_ok=True)
        for i in range(5):
            t = np.arange(int(0.25 * sr)) / sr
            sig = 0.4 * np.sin(2 * np.pi * (300.0 + 140.0 * i) * t)
            sig = sig + 1e-4 * np.random.default_rng(i).standard_normal(len(t))
            write_wav(
                os.path.join(corpus, f"u{i}.wav"),
                float_to_wave(sig.astype(np.float64), sr),
            )
    barrier("corpus_fixture")
    paths = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".wav")
    )
    runner = CorpusRunner(cfg, sr, batch_size=4)
    cstats, summary = runner.run_distributed(paths, out_dir)
    if rank == 0:
        assert summary is not None
        assert summary["files_ok"] == len(paths), summary
        assert summary["manifest_shards"] == nproc
        assert os.path.exists(os.path.join(out_dir, "feature_stats.json"))
        print(
            f"dryrun_multiprocess OK: {nproc} processes x {LOCAL_DEVICES} "
            f"devices = {jax.device_count()}-device global mesh; "
            f"DP batch {b_global} (+{pad_rows} pad rows/process) "
            f"sharded across processes; gathered==single-process mel "
            f"max_dev={max_dev:.3e}, stats rel dev={stats_dev:.3e}; "
            f"CP long utterance: {n_seg} segments sharded across "
            f"processes, max_dev={cp_dev:.3e}; "
            f"distributed corpus: {summary['files_ok']} files over "
            f"{summary['manifest_shards']} process shards, rank-0 merged",
            flush=True,
        )
    # negative: a drifted path list on one rank must be refused before any
    # work (digest allgather disagrees on every rank)
    drifted = paths if rank == 0 else list(reversed(paths))
    try:
        runner.run_distributed(drifted, os.path.join(workdir, "nope"))
        raise AssertionError("drifted path list was not refused")
    except ValueError as e:
        assert "digests disagree" in str(e), e
    digest_guard_ok = True

    with open(os.path.join(workdir, f"rank{rank}.json"), "w") as f:
        json.dump(
            {
                "rank": rank,
                "nproc": nproc,
                "devices": jax.device_count(),
                "max_dev": max_dev,
                "stats_dev": stats_dev,
                "pad_rows": pad_rows,
                "cp_segments": n_seg,
                "cp_dev": cp_dev,
                "corpus_files_done": cstats.files_done,
                "digest_guard_ok": digest_guard_ok,
            },
            f,
        )


if __name__ == "__main__":
    main()
