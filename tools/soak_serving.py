"""Randomized serving-equivalence soak (ad hoc, like tools/soak.py).

Each scenario drives MultiStreamOnline twice with identical random feeds —
once synchronous (pipeline_depth=1, max_segments_per_poll=1) and once with
random throughput knobs (depth 2-3, K 1-3, random poll cadence, random
close order, bounded/unbounded buffers, random mid-run flush_pipeline()
quiesces and double-poll bursts) — and asserts the emitted
(stream, seg_idx) -> value maps agree (bit-exact in f64 at K=1; 1e-9 at
K>1, whose K-segment-span program XLA may reassociate). Under
drop_oldest it instead asserts the partition invariant: emitted + dropped
segment indices are disjoint and complete per stream, and every emitted
segment matches the synchronous run's same-index segment.

    python tools/soak_serving.py [n_scenarios] [seed_base]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from auditory_tpu.pipeline.online import MultiStreamOnline
from tests.conftest import default_cfg_2d, tone

SR = 16000


def run_scenario(rng, knobs):
    cfg = default_cfg_2d()
    n = int(rng.integers(1, 5))
    sigs = [
        tone(float(rng.uniform(300, 3000)), float(rng.uniform(0.15, 0.9)), SR)
        for _ in range(n)
    ]
    feeds = []  # deterministic feed schedule shared by both runs
    cursors = [0] * n
    while any(c < len(s) for c, s in zip(cursors, sigs)):
        i = int(rng.integers(0, n))
        if cursors[i] >= len(sigs[i]):
            continue
        sz = int(rng.integers(150, 6000))
        feeds.append((i, cursors[i], cursors[i] + sz))
        cursors[i] += sz
    close_order = rng.permutation(n)
    poll_every = int(rng.integers(1, 4))  # poll after every k-th feed
    # random quiesce/burst schedule (knobbed run only): after feed j,
    # flush_pipeline() harvests all in-flight calls without dispatching
    # (exercises the pipeline's mid-stream quiesce path under random
    # timing); a burst polls twice back-to-back (second poll usually
    # finds the just-dispatched call still warm). Neither may change the
    # emitted (stream, seg) -> value map.
    flush_after = {int(j) for j in
                   rng.choice(max(1, len(feeds)), size=min(3, len(feeds)),
                              replace=False)
                   if rng.random() < 0.5}
    burst_after = {int(j) for j in
                   rng.choice(max(1, len(feeds)), size=min(3, len(feeds)),
                              replace=False)
                   if rng.random() < 0.5}

    def drive(depth, k, bounded, overflow, perturb=False):
        ms = MultiStreamOnline(
            cfg, SR, n_streams=n, dtype=jnp.float64,
            pipeline_depth=depth, max_segments_per_poll=k,
            max_buffer_seconds=(
                float(rng_bounded) if bounded else None
            ),
            overflow=overflow,
        )
        got = {}

        def collect(res):
            for i_, k_, out in res:
                assert (i_, k_) not in got, ("dup emit", i_, k_)
                got[(i_, k_)] = out["mel_fbank_segment"]

        for j, (i, lo, hi) in enumerate(feeds):
            ms.feed(i, sigs[i][lo:hi])
            if j % poll_every == 0:
                collect(ms.poll())
                if perturb and j in burst_after:
                    collect(ms.poll())
            if perturb and j in flush_after:
                collect(ms.flush_pipeline())
        for i in close_order:
            ms.close(int(i))
            collect(ms.poll())
        collect(list(ms.drain()))
        assert not ms._inflight and not ms._inflight_segs.any()
        drops = [ms.dropped_segments(s) for s in range(n)]
        return got, drops

    rng_bounded = float(rng.uniform(0.3, 1.5))
    depth = int(rng.integers(2, 4))
    k = int(rng.integers(1, 4))
    bounded = bool(rng.integers(0, 2))
    overflow = "drop_oldest" if (bounded and rng.integers(0, 2)) else "error"

    def assert_match(a, b):
        # K=1 runs the identical program -> bit-exact; K>1 runs a
        # K-segment-span program whose XLA schedule may reassociate
        # (same 1e-9 f64 bound as tests/test_online.py's poll-K test)
        if k == 1:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, atol=1e-9)

    if overflow == "error":
        # unbounded error-policy never drops: emitted maps must agree
        ref, dref = drive(1, 1, False, "error")
        got, dgot = drive(depth, k, False, "error", perturb=True)
        assert dref == dgot == [0] * len(dref)
        assert set(got) == set(ref), (sorted(ref), sorted(got))
        for key in ref:
            assert_match(got[key], ref[key])
    else:
        # drop_oldest: drops depend on poll timing (the pipelined run
        # legitimately drops a different set), so assert the partition
        # invariant + value equality on surviving segments
        ref, _ = drive(1, 1, False, "error")  # droplsess oracle
        got, drops = drive(depth, k, True, "drop_oldest", perturb=True)
        per_stream_total = {}
        for (i_, k_) in ref:
            per_stream_total[i_] = max(per_stream_total.get(i_, -1), k_)
        for s in range(len(drops)):
            emitted = sorted(k_ for (i_, k_) in got if i_ == s)
            total = per_stream_total.get(s, -1) + 1
            assert len(emitted) + drops[s] == total, (s, emitted, drops, total)
        for key in got:
            assert_match(got[key], ref[key])
    return knobs | dict(n=n, depth=depth, k=k, overflow=overflow)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 550000
    ok = 0
    for seed in range(n):
        rng = np.random.default_rng(base + seed)
        info = run_scenario(rng, dict(seed=base + seed))
        ok += 1
        if ok % 10 == 0:
            print(f"progress {ok}/{n}", flush=True)
    print(f"DONE ok={ok}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
