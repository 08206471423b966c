"""Batched / sharded corpus processing.

The reference processes one window at a time in one goroutine; at corpus
scale (TIMIT: thousands of utterances) the TPU-native form is: pad utterances
into [B, S_max] batches (bucketed by length), run the whole SndEnv pipeline
for every segment of every utterance in one jitted program, shard the batch
axis over the device mesh, and mask invalid segments/steps.

Masking semantics (matches the reference exactly):
- step-invalid: window end beyond the signal -> zero columns
  (sndenv.go:353-359 break semantics; see dsp/frame.py)
- segment-invalid: segment index >= SegCnt(len) (sndenv.go:263-265) -> the
  reference never runs ProcessSegment for these; all outputs zeroed and
  ``seg_valid`` False.

Also provides :class:`CorpusRunner`: host-side WAV decode (thread pool) ->
bucketed batches -> device pipeline -> per-utterance ``.npz`` outputs, with a
resumable JSONL manifest (checkpoint/restart + failure records for
undecodable files; SURVEY.md section 5 aux-subsystem equivalents).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SndEnvConfig
from ..io.wav import load_wav
from ..parallel.mesh import batch_sharding, pad_to_multiple, replicated
from .sndenv import SndEnv, SndEnvOutputs

__all__ = ["BatchedSndEnv", "CorpusRunner", "bucket_length"]


def bucket_length(
    n: int,
    timing,
    min_samples: Optional[int] = None,
    quantum: int = 0,
) -> int:
    """Round a padded signal length up to the next stride boundary so jit
    recompiles only per bucket, not per file. ``quantum`` (samples) coarsens
    the buckets further -- each distinct bucket is one XLA compile, and
    compiles are expensive; masking makes the extra padding free."""
    stride = timing.stride_samples
    base = timing.segment_samples
    step = max(stride, quantum)
    if n <= base:
        out = base
    else:
        k = -(-(n - base) // step)
        out = base + k * step
        # keep the stride alignment the masking math expects
        out = base + (-(-(out - base) // stride)) * stride
    if min_samples is not None:
        out = max(out, min_samples)
    return out


class BatchedSndEnv:
    """The SndEnv pipeline over a padded utterance batch, optionally sharded
    over a device mesh.

    shard_axis='batch' (default): data parallelism over utterances -- the
    signals' leading axis is sharded, no collectives in the hot path.

    shard_axis='segment': CP-style sharding of the *segment* axis for few
    very long utterances -- the signal is replicated (cheap relative to the
    per-segment compute) and every [B, seg, ...] intermediate is constrained
    to shard on axis 1; segments are independent when prev_smooth == 0, so
    this is also communication-free. SURVEY.md section 5 long-context
    equivalent.
    """

    def __init__(
        self,
        env: SndEnv,
        mesh: Optional[jax.sharding.Mesh] = None,
        axis_name: str = "data",
        shard_axis: str = "batch",
    ):
        if shard_axis not in ("batch", "segment"):
            raise ValueError("shard_axis must be 'batch' or 'segment'")
        if shard_axis == "segment" and env.cfg.dft.prev_smooth != 0.0:
            raise ValueError(
                "segment sharding requires prev_smooth == 0 (the smoothing "
                "recurrence couples steps within a segment only, but the "
                "reference zeroes state per segment -- still, keep it simple)"
            )
        self.env = env
        self.mesh = mesh
        self.axis_name = axis_name
        self.shard_axis = shard_axis
        self._jit_cache: Dict[Tuple[int, int], Any] = {}

    def _build(self, n_samples: int, add_ms: int):
        # the SndEnv program is natively batched: [B, S] + lengths [B]
        batch_program = self.env._build(n_samples, add_ms)
        if self.mesh is None:
            return jax.jit(batch_program)

        if self.shard_axis == "batch":
            in_shardings = (
                batch_sharding(self.mesh, 2, self.axis_name),
                batch_sharding(self.mesh, 1, self.axis_name),
            )
            return jax.jit(batch_program, in_shardings=in_shardings)

        # segment sharding: replicate inputs, constrain outputs on axis 1
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, axis = self.mesh, self.axis_name

        def seg_sharded(x):
            if x is None or x.ndim < 2:
                return x
            spec = P(None, axis, *([None] * (x.ndim - 2)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        def program(signals, lengths):
            res = batch_program(signals, lengths)
            out, seg_valid, rest = res[0], res[1], res[2:]
            out = jax.tree_util.tree_map(
                seg_sharded, out, is_leaf=lambda v: v is None
            )
            return (out, seg_sharded(seg_valid)) + rest

        repl = replicated(self.mesh)
        return jax.jit(program, in_shardings=(repl, repl))

    def process_fn(self, n_samples: int, add_ms: int = 0):
        key = (n_samples, add_ms)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(n_samples, add_ms)
        return self._jit_cache[key]

    def process(
        self,
        signals: np.ndarray,
        lengths: np.ndarray,
        add_ms: int = 0,
    ) -> Tuple[SndEnvOutputs, jnp.ndarray]:
        """signals [B, S] (padded), lengths [B] -> (outputs with leading
        [B, seg] axes, seg_valid [B, seg]).

        Any batch size works on any mesh: when B is not a multiple of the
        device count, the batch is padded internally with zero-length rows
        (which the seg/step validity masks make inert, including in the
        feature-stats moments) and the padded rows are sliced off the
        returned outputs."""
        signals = jnp.asarray(signals)
        b = signals.shape[0]
        mult = self.batch_multiple
        b_padded = pad_to_multiple(b, mult)
        if b_padded != b:
            pad = b_padded - b
            signals = jnp.concatenate(
                [signals, jnp.zeros((pad,) + signals.shape[1:], signals.dtype)]
            )
            lengths = jnp.concatenate(
                [jnp.asarray(lengths, dtype=jnp.int32),
                 jnp.zeros(pad, dtype=jnp.int32)]
            )
        fn = self.process_fn(signals.shape[-1], add_ms)
        if self.mesh is not None and self.shard_axis == "batch":
            signals = jax.device_put(
                signals, batch_sharding(self.mesh, 2, self.axis_name)
            )
            lengths = jax.device_put(
                jnp.asarray(lengths, dtype=jnp.int32),
                batch_sharding(self.mesh, 1, self.axis_name),
            )
        elif self.mesh is not None:
            signals = jax.device_put(signals, replicated(self.mesh))
            lengths = jax.device_put(
                jnp.asarray(lengths, dtype=jnp.int32), replicated(self.mesh)
            )
        else:
            lengths = jnp.asarray(lengths, dtype=jnp.int32)
        res = fn(signals, lengths)
        if b_padded != b:
            trim = lambda x: None if x is None else x[:b]
            out = jax.tree_util.tree_map(
                trim, res[0], is_leaf=lambda v: v is None
            )
            res = (out, res[1][:b]) + res[2:]
        return res

    @property
    def batch_multiple(self) -> int:
        if self.mesh is None or self.shard_axis != "batch":
            return 1
        return self.mesh.devices.size


@dataclass
class CorpusStats:
    files_done: int = 0
    files_failed: int = 0
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0

    @property
    def rtf(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0


class CorpusRunner:
    """Resumable batched extraction over a corpus of WAV files.

    - host decode in a thread pool, device compute in length buckets
    - JSONL manifest ``manifest.jsonl`` in ``out_dir``: one record per file
      ({path, status: ok|error, error?}); on resume, files already 'ok' are
      skipped (checkpoint/restart equivalent, SURVEY.md section 5)
    - undecodable/odd files are recorded as errors and skipped, never fatal
      (failure-detection equivalent)
    """

    def __init__(
        self,
        cfg: SndEnvConfig,
        sample_rate: int,
        batch_size: int = 64,
        dtype=jnp.float32,
        mesh: Optional[jax.sharding.Mesh] = None,
        save_keys: Sequence[str] = ("mel_fbank_segment", "gabor_kwta"),
        decode_threads: int = 8,
        bucket_quantum_s: float = 1.0,
        feature_stats: bool = True,
    ):
        # only materialize what gets saved (XLA DCEs the rest)
        self.env = SndEnv(
            cfg, sample_rate, dtype=dtype,
            outputs=tuple(save_keys) + ("step_valid",),
            feature_stats=feature_stats,
        )
        self.batched = BatchedSndEnv(self.env, mesh=mesh)
        self.batch_size = batch_size
        self.save_keys = tuple(save_keys)
        self.decode_threads = decode_threads
        self._bucket_quantum = int(bucket_quantum_s * sample_rate)
        self.sample_rate = sample_rate

    def _decode(self, path: str) -> Tuple[str, Optional[np.ndarray], Optional[str]]:
        try:
            w = load_wav(path)
            if w.sample_rate != self.sample_rate:
                return path, None, (
                    f"sample rate {w.sample_rate} != pipeline rate "
                    f"{self.sample_rate}"
                )
            sig = w.sound_to_tensor(dtype=np.float32)
            sig = self.env.pad(sig)
            return path, sig, None
        except Exception as e:  # noqa: BLE001 - failure detection, not flow
            return path, None, f"{type(e).__name__}: {e}"

    def _decode_many(self, paths):
        """Decode a list of paths -> iterable of (path, signal|None, err|None).

        Uses the native threaded batch decoder (csrc/auditory_io.cpp) when
        built, else the Python thread pool."""
        from ..io import native

        if not native.available() or not paths:
            with ThreadPoolExecutor(self.decode_threads) as pool:
                yield from pool.map(self._decode, paths)
            return

        # chunked native decode: bounds the [chunk, max_frames] buffer and
        # keeps host decode overlapping with device compute
        chunk_files = max(self.batch_size, 32)
        for lo in range(0, len(paths), chunk_files):
            group = paths[lo : lo + chunk_files]
            max_frames = 0
            metas = {}
            for p in group:
                try:
                    sr, ch, bd, nf = native.wav_info(p)
                    metas[p] = (sr, nf)
                    max_frames = max(max_frames, nf)
                except IOError as e:
                    metas[p] = e
            ok_paths = [p for p in group if not isinstance(metas[p], Exception)]
            out, lengths, srs, errors = native.decode_batch(
                ok_paths, max(max_frames, 1), n_threads=self.decode_threads
            )
            by_path = {p: i for i, p in enumerate(ok_paths)}
            for p in group:
                meta = metas[p]
                if isinstance(meta, Exception):
                    yield p, None, str(meta)
                    continue
                i = by_path[p]
                if errors[i] is not None:
                    yield p, None, errors[i]
                elif srs[i] != self.sample_rate:
                    yield p, None, (
                        f"sample rate {srs[i]} != pipeline rate {self.sample_rate}"
                    )
                else:
                    sig = out[i, : lengths[i]]
                    yield p, self.env.pad(sig), None

    @staticmethod
    def _out_names(paths: Sequence[str]) -> Dict[str, str]:
        """Unique output stem per input path. Same-named WAVs in different
        directories (the normal TIMIT layout: DR1/FCJF0/SA1.WAV,
        DR1/FVMH0/SA1.WAV, ...) must not clobber each other, so stems come
        from the path relative to the corpus' common directory with
        separators flattened to '_'."""
        if not paths:
            return {}
        dirs = {os.path.dirname(os.path.abspath(p)) for p in paths}
        common = os.path.commonpath(list(dirs)) if len(dirs) > 1 else dirs.pop()
        out = {}
        used = {}
        for p in paths:
            rel = os.path.relpath(os.path.abspath(p), common)
            stem = os.path.splitext(rel)[0].replace(os.sep, "_")
            # flattening separators can itself collide (DR1/A/S1 vs DR1/A_S1);
            # disambiguate deterministically
            n = used.get(stem, 0)
            used[stem] = n + 1
            out[p] = stem if n == 0 else f"{stem}-{n}"
        return out

    def run(
        self,
        wav_paths: Sequence[str],
        out_dir: str,
        resume: bool = True,
        add_ms: int = 0,
    ) -> CorpusStats:
        os.makedirs(out_dir, exist_ok=True)
        self._stems = self._out_names(list(wav_paths))
        manifest_path = os.path.join(out_dir, "manifest.jsonl")
        done = set()
        if resume and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if rec.get("status") == "ok":
                        done.add(rec["path"])
        todo = [p for p in wav_paths if p not in done]

        stats = CorpusStats()
        self._moments = {"sum": 0.0, "sumsq": 0.0, "count": 0.0}
        t0 = time.perf_counter()
        manifest = open(manifest_path, "a")
        try:
            buckets: Dict[int, List[Tuple[str, np.ndarray]]] = {}
            for path, sig, err in self._decode_many(todo):
                if err is not None:
                    stats.files_failed += 1
                    manifest.write(
                        json.dumps({"path": path, "status": "error", "error": err})
                        + "\n"
                    )
                    continue
                blen = bucket_length(
                    len(sig), self.env.timing, quantum=self._bucket_quantum
                )
                buckets.setdefault(blen, []).append((path, sig))
                if len(buckets[blen]) >= self.batch_size:
                    self._flush(buckets.pop(blen), blen, out_dir, add_ms,
                                manifest, stats)
            for blen, items in list(buckets.items()):
                self._flush(items, blen, out_dir, add_ms, manifest, stats)
        finally:
            manifest.close()
        if self.env.feature_stats and np.ndim(self._moments["sum"]):
            # corpus-wide per-mel-band normalization statistics
            cnt = max(float(self._moments["count"]), 1.0)
            mean = self._moments["sum"] / cnt
            var = np.maximum(self._moments["sumsq"] / cnt - mean**2, 0.0)
            with open(os.path.join(out_dir, "feature_stats.json"), "w") as f:
                json.dump(
                    {
                        "mel_mean": mean.tolist(),
                        "mel_std": np.sqrt(var).tolist(),
                        "count_steps": cnt,
                    },
                    f,
                )
        stats.wall_seconds = time.perf_counter() - t0
        return stats

    def _flush(self, items, blen, out_dir, add_ms, manifest, stats):
        # mesh padding happens inside BatchedSndEnv.process
        signals = np.zeros((len(items), blen), dtype=np.float32)
        lengths = np.zeros(len(items), dtype=np.int32)
        for i, (_, sig) in enumerate(items):
            signals[i, : len(sig)] = sig
            lengths[i] = len(sig)
        res = self.batched.process(signals, lengths, add_ms)
        out, seg_valid = res[0], res[1]
        out = jax.block_until_ready(out)
        sv = np.asarray(seg_valid)
        if len(res) > 2:
            mom = res[2]
            self._moments = {
                k: self._moments[k] + np.asarray(v, dtype=np.float64)
                for k, v in mom.items()
            }
        # one device->host transfer per key per batch (per-item transfers
        # would pay a host round trip each)
        host = {
            k: np.asarray(getattr(out, k))
            for k in self.save_keys
            if getattr(out, k) is not None
        }

        def write_one(i_path_sig):
            i, path, n_audio = i_path_sig
            n_seg = int(sv[i].sum())
            rec = {k: v[i][:n_seg] for k, v in host.items()}
            stem = self._stems.get(
                path, os.path.splitext(os.path.basename(path))[0]
            )
            np.savez(os.path.join(out_dir, stem + ".npz"), **rec)
            return path, n_audio

        jobs = [(i, path, len(sig)) for i, (path, sig) in enumerate(items)]
        with ThreadPoolExecutor(self.decode_threads) as pool:
            for path, n_audio in pool.map(write_one, jobs):
                manifest.write(json.dumps({"path": path, "status": "ok"}) + "\n")
                stats.files_done += 1
                stats.audio_seconds += n_audio / self.sample_rate
        manifest.flush()
