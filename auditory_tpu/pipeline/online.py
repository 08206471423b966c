"""Online (streaming) processing: feed audio chunks, get segments out.

The reference is strictly offline (whole WAV in memory); its only streaming
notion is the segment cursor (processspeech MoreSegments). For production
serving, :class:`OnlineSndEnv` accepts arbitrary-size sample chunks and emits
the same per-segment outputs as the offline :class:`..pipeline.sndenv.SndEnv`
as soon as each segment's samples (including its right border windows) are
available -- with O(segment) memory and one fixed-shape jitted program (no
per-length recompiles).

Equivalence: segment k of the offline pipeline needs stream samples
[k*stride - border*step, k*stride + (steps-1-border)*step + win). The online
processor keeps a rolling buffer of exactly that span and runs the offline
program on it with an `add` offset that shifts the window grid onto the
buffered history, so outputs are bit-identical to the offline run (tested).
"""

from __future__ import annotations

import dataclasses

from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SndEnvConfig, samples_to_msec
from .sndenv import SndEnv, SndEnvOutputs

__all__ = ["OnlineSndEnv", "MultiStreamOnline"]


class OnlineSndEnv:
    """Streaming wrapper around the SndEnv pipeline.

    Usage::

        online = OnlineSndEnv(cfg, 16000)
        for chunk in audio_chunks:          # any sizes
            for seg_idx, out in online.feed(chunk):
                consume(out.mel_fbank_segment, out.gabor_kwta, ...)
        for seg_idx, out in online.flush(): # zero-pad the tail
            ...
    """

    def __init__(
        self,
        cfg: SndEnvConfig,
        sample_rate: int,
        dtype=jnp.float32,
        outputs: Optional[Tuple[str, ...]] = None,
        **env_kw,
    ):
        if outputs is not None and "mel_fbank_global" in outputs:
            raise ValueError(
                "mel_fbank_global is a corpus-transfer optimization on the "
                "shared window grid; the online paths emit per-segment "
                "tensors -- request mel_fbank_segment instead"
            )
        self.env = SndEnv(
            cfg, sample_rate, dtype=dtype, outputs=outputs, **env_kw
        )
        t = self.env.timing
        border = cfg.params.border_steps
        self._pre = border * t.step_samples
        # last window of a segment starts at (steps-1-border)*step and spans win
        self._post = (t.segment_steps - 1 - border) * t.step_samples + t.win_samples
        self._span = self._pre + self._post
        # the add offset must convert to exactly _pre samples
        add_ms = samples_to_msec(self._pre, sample_rate)
        from ..config import msec_to_samples

        if msec_to_samples(add_ms, sample_rate) != self._pre:
            raise ValueError(
                "border offset does not round-trip through milliseconds; "
                "choose step_ms with integral sample counts"
            )
        self._add_ms = add_ms
        self._fn = None
        self._span_len_dev = None  # cached device scalar for full-span emits

        self._np_dtype = np.dtype(self.env.dtype)
        self._buf = np.zeros(0, dtype=self._np_dtype)
        self._stream_pos = 0  # stream index of _buf[0]
        self._next_seg = 0
        self._closed = False

    @property
    def stride_duration_s(self) -> float:
        """Seconds of new audio per emitted segment."""
        return self.env.timing.stride_samples / self.env.sample_rate

    @property
    def segment_duration_s(self) -> float:
        """Seconds of audio one segment covers (>= stride when overlapping)."""
        return self.env.timing.segment_samples / self.env.sample_rate

    def _ready(self) -> bool:
        t = self.env.timing
        seg_start = self._next_seg * t.stride_samples
        return self._stream_pos + len(self._buf) >= seg_start + self._post

    def _emit(self, valid_until: Optional[int] = None) -> Tuple[int, SndEnvOutputs]:
        t = self.env.timing
        seg_start = self._next_seg * t.stride_samples
        lo = seg_start - self._pre
        # slice [lo, seg_start + _post); left-pad zeros before stream start
        pad_left = max(0, -lo)
        buf_lo = max(0, lo - self._stream_pos)
        buf_hi = seg_start + self._post - self._stream_pos
        window = np.concatenate(
            [
                np.zeros(pad_left, dtype=self._np_dtype),
                self._buf[buf_lo:buf_hi],
            ]
        )
        assert len(window) == self._span, (len(window), self._span)
        if self._fn is None:
            # squeeze the [B=1, seg=1] axes INSIDE the jitted program: doing
            # it eagerly would dispatch one tiny device op per output leaf
            # per segment (~16 link round trips -> ~30 ms/segment on the
            # tunneled backend; one fused call is ~2 ms)
            inner = self.env._build(self._span, self._add_ms)

            def fn(window, sig_len):
                res = inner(window[None], sig_len[None])
                return jax.tree_util.tree_map(
                    lambda x: None if x is None else x[0, 0],
                    res[0],
                    is_leaf=lambda v: v is None,
                )

            self._fn = jax.jit(fn)
        # a step is valid while its window ends within `valid_until` (stream
        # coordinates) -- matches the offline break-on-overrun semantics
        sig_len = (
            self._span if valid_until is None
            else max(0, min(self._span, valid_until - lo))
        )
        if sig_len == self._span:
            # the steady-state value: cache the device scalar (a fresh host
            # scalar would pay a link round trip per segment)
            if self._span_len_dev is None:
                self._span_len_dev = jnp.asarray(self._span, dtype=jnp.int32)
            sl = self._span_len_dev
        else:
            sl = jnp.asarray(sig_len, dtype=jnp.int32)
        out = self._fn(jnp.asarray(window), sl)
        seg_idx = self._next_seg
        self._next_seg += 1
        # drop history no future segment needs
        keep_from = (self._next_seg * t.stride_samples - self._pre) - self._stream_pos
        if keep_from > 0:
            self._buf = self._buf[keep_from:]
            self._stream_pos += keep_from
        return seg_idx, out

    def feed(self, samples: np.ndarray) -> Iterator[Tuple[int, SndEnvOutputs]]:
        """Append samples (eagerly -- the chunk is buffered even if the
        returned iterator is never consumed); iterating yields
        (segment_index, outputs) for every segment completed by this chunk."""
        if self._closed:
            raise RuntimeError(
                "stream closed by flush(); create a new OnlineSndEnv"
            )
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, dtype=self._np_dtype)]
        )
        return self._drain()

    def _drain(self) -> Iterator[Tuple[int, SndEnvOutputs]]:
        while self._ready():
            yield self._emit()

    def flush(self) -> Iterator[Tuple[int, SndEnvOutputs]]:
        """Zero-pad the tail exactly like SndEnv.Pad (sndenv.go:510-519) and
        emit the remaining segments the offline pipeline would produce on the
        padded signal (steps whose windows overrun the padded end are masked
        to zero, matching the break-on-overrun semantics). Closes the stream;
        a second flush emits nothing and further feed() raises."""
        if self._closed:
            return
        self._closed = True
        from ..dsp.frame import pad_len

        t = self.env.timing
        stream_end = self._stream_pos + len(self._buf)  # real audio end, fixed
        padded_end = stream_end + pad_len(stream_end, t)
        # offline SegCnt on the padded signal (sndenv.go:263-265) -- use the
        # quirk-preserving seg_cnt, NOT `k*stride + SegmentSamples <=
        # padded_end`: Go's truncation-toward-zero yields ONE (fully masked)
        # segment even when the padded signal is shorter than a segment, and
        # the offline pipeline emits it
        while self._next_seg < max(self.env.seg_cnt(padded_end), 0):
            buf_end = self._stream_pos + len(self._buf)
            need = self._next_seg * t.stride_samples + self._post - buf_end
            if need > 0:
                self._buf = np.concatenate(
                    [self._buf, np.zeros(need, dtype=self._np_dtype)]
                )
            yield self._emit(valid_until=padded_end)


class _StreamState:
    """Host-side rolling-buffer state for one stream (the device pipeline is
    shared; only these few fields are per-stream)."""

    __slots__ = ("buf", "stream_pos", "next_seg", "closed", "padded_end")

    def __init__(self, np_dtype):
        self.buf = np.zeros(0, dtype=np_dtype)
        self.stream_pos = 0
        self.next_seg = 0
        self.closed = False
        self.padded_end = None


class MultiStreamOnline:
    """N concurrent audio streams through ONE jitted [N, span] program --
    the production serving form: per-poll device cost is ~one single-stream
    call, so throughput scales ~N x at single-stream latency.

    Semantics per stream are identical to :class:`OnlineSndEnv` (same
    rolling-buffer math, same offline bit-equivalence, same flush padding).

    Usage::

        ms = MultiStreamOnline(cfg, 16000, n_streams=16,
                               outputs=("mel_fbank_segment", "gabor_kwta"))
        ms.feed(3, chunk)                  # buffer audio for stream 3
        for i, seg_idx, out in ms.poll():  # ONE device call for all ready
            serve(i, out["gabor_kwta"])    # host numpy arrays
        ms.close(5)                        # pad + drain stream 5's tail
    """

    def __init__(
        self,
        cfg: SndEnvConfig,
        sample_rate: int,
        n_streams: int,
        dtype=jnp.float32,
        outputs: Optional[Tuple[str, ...]] = None,
        transfer_dtype=None,
        mesh=None,
        axis_name: str = "data",
        **env_kw,
    ):
        """``transfer_dtype``: dtype of the per-poll packed host copy.
        None ships the pipeline dtype; ``float16`` halves poll bytes (cast);
        ``'int8'`` quarters them via per-channel quantized transfer (lossy,
        same scheme as the corpus :class:`..pipeline.batch.PackedBatch`).
        The poll copy is the serving path's bandwidth bottleneck -- its
        bytes scale with n_streams -- so this knob directly sets the
        sustainable concurrent-stream capacity on a byte-bound link.

        ``mesh``: shard the stream axis over a device mesh (DP over streams;
        the pipeline is pointwise per stream, so polls need no collectives).
        ``n_streams`` must divide evenly over the mesh devices."""
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        if mesh is not None and n_streams % mesh.devices.size != 0:
            raise ValueError(
                f"n_streams ({n_streams}) must be a multiple of the mesh "
                f"size ({mesh.devices.size}): every poll runs the full "
                "fixed-shape stream batch"
            )
        self.n_streams = n_streams
        self.mesh = mesh
        self.axis_name = axis_name
        self.transfer_dtype = (
            jnp.dtype(transfer_dtype) if transfer_dtype is not None else None
        )
        self._quantize = self.transfer_dtype == jnp.dtype(jnp.int8)
        # ONE shared pipeline (filter design etc. built once); per-stream
        # state is just the rolling buffer bookkeeping
        tpl = OnlineSndEnv(cfg, sample_rate, dtype=dtype, outputs=outputs,
                           **env_kw)
        self.env = tpl.env
        self._pre = tpl._pre
        self._post = tpl._post
        self._span = tpl._span
        self._add_ms = tpl._add_ms
        self._np_dtype = tpl._np_dtype
        self._fn = None
        self._streams = [
            _StreamState(self._np_dtype) for _ in range(n_streams)
        ]

    def feed(self, stream: int, samples: np.ndarray) -> None:
        """Buffer samples for one stream (no device work until poll)."""
        st = self._streams[stream]
        if st.closed:
            raise RuntimeError(f"stream {stream} is closed")
        st.buf = np.concatenate(
            [st.buf, np.asarray(samples, dtype=self._np_dtype)]
        )

    def close(self, stream: int) -> None:
        """End-of-stream: apply the SndEnv.Pad tail padding; subsequent
        polls drain the remaining segments (then the stream goes idle)."""
        from ..dsp.frame import pad_len

        st = self._streams[stream]
        if st.closed:
            return
        st.closed = True
        t = self.env.timing
        stream_end = st.stream_pos + len(st.buf)
        st.padded_end = stream_end + pad_len(stream_end, t)

    def _stream_ready(self, i: int) -> bool:
        st = self._streams[i]
        t = self.env.timing
        if st.closed:
            # drain exactly the segments the offline padded run would
            # produce (poll() extends the zero tail for border windows);
            # seg_cnt's Go truncation-toward-zero quirk yields one masked
            # segment even for streams shorter than a segment
            return st.next_seg < max(self.env.seg_cnt(st.padded_end), 0)
        return (
            st.stream_pos + len(st.buf)
            >= st.next_seg * t.stride_samples + self._post
        )

    def _build_fn(self):
        from .batch import _quant_chan_axis, _quantize_int8

        inner = self.env._build(self._span, self._add_ms)
        quantize = self._quantize
        # key -> (trailing shape, col range, n_chan, chan_ax); filled at trace
        layout = {}

        def fn(windows, sig_lens):
            res = inner(windows, sig_lens)
            # squeeze the seg=1 axis and pack every leaf into ONE flat
            # [N, C] buffer: per-leaf host copies would each pay the link's
            # fixed round trip per poll
            pack_dtype = (
                self.transfer_dtype
                if self.transfer_dtype is not None and not quantize
                else self.env.dtype
            )
            cols, off, qscales = [], 0, []
            for f, x in dataclasses.asdict(res[0]).items():
                if x is None:
                    continue
                x = x[:, 0]
                n_chan, chan_ax = 0, None
                if quantize and jnp.issubdtype(x.dtype, jnp.floating):
                    chan_ax = _quant_chan_axis(f, tuple(x.shape[1:]), None)
                    n_chan = (
                        1 if chan_ax is None else x.shape[1 + chan_ax]
                    )
                    # per_row: every stream gets its own scales, so one
                    # stream's precision never depends on co-polled tenants
                    q, sc, ofv = _quantize_int8(
                        x[:, None], chan_ax, symmetric=False, per_row=True
                    )
                    qscales += [sc, ofv]  # each [N, n_chan]
                    flat = q[:, 0].reshape(x.shape[0], -1)
                elif quantize:
                    # bool/int leaves (step_valid) ship as raw int8
                    flat = x.reshape(x.shape[0], -1).astype(jnp.int8)
                else:
                    flat = x.reshape(x.shape[0], -1).astype(pack_dtype)
                layout[f] = (
                    tuple(x.shape[1:]), off, off + flat.shape[-1],
                    n_chan, chan_ax,
                )
                cols.append(flat)
                off += flat.shape[-1]
            if quantize:
                # per-row trailer: each stream's scales in its own row
                svec = jnp.concatenate(qscales, axis=1)  # [N, n_floats]
                sbytes = jax.lax.bitcast_convert_type(
                    svec, jnp.int8
                ).reshape(svec.shape[0], -1)
                layout["__qmeta__"] = (
                    (int(sbytes.shape[1]),), off,
                    off + int(sbytes.shape[1]), 0, None,
                )
                cols.append(sbytes)
            return jnp.concatenate(cols, axis=-1)

        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            shardings = (
                batch_sharding(self.mesh, 2, self.axis_name),  # windows
                batch_sharding(self.mesh, 1, self.axis_name),  # sig_lens
            )
            return jax.jit(fn, in_shardings=shardings), layout
        return jax.jit(fn), layout

    def poll(self):
        """Run ONE batched device call covering every stream with a
        complete segment pending; returns a list of
        (stream, seg_idx, {key: np.ndarray}) with host arrays.

        Per-stream state advances only AFTER the device call returns, so a
        failed dispatch (e.g. a flaky remote compile) loses nothing: the
        next poll retries the same segments."""
        ready = [i for i in range(self.n_streams) if self._stream_ready(i)]
        if not ready:
            return []
        t = self.env.timing
        windows = np.zeros((self.n_streams, self._span), self._np_dtype)
        sig_lens = np.zeros(self.n_streams, np.int32)
        for i in ready:
            st = self._streams[i]
            seg_start = st.next_seg * t.stride_samples
            lo = seg_start - self._pre
            if st.closed:
                # border windows of the final segments read past the padded
                # end; extend the zero tail on demand (OnlineSndEnv.flush
                # does the same)
                need = (seg_start + self._post) - (
                    st.stream_pos + len(st.buf)
                )
                if need > 0:
                    st.buf = np.concatenate(
                        [st.buf, np.zeros(need, self._np_dtype)]
                    )
            pad_left = max(0, -lo)
            buf_lo = max(0, lo - st.stream_pos)
            buf_hi = seg_start + self._post - st.stream_pos
            w = np.concatenate(
                [np.zeros(pad_left, self._np_dtype), st.buf[buf_lo:buf_hi]]
            )
            assert len(w) == self._span
            windows[i] = w
            sig_lens[i] = (
                self._span
                if not st.closed
                else max(0, min(self._span, st.padded_end - lo))
            )
        if self._fn is None:
            self._fn, self._layout = self._build_fn()
        packed = self._fn(
            jnp.asarray(windows), jnp.asarray(sig_lens, dtype=jnp.int32)
        )
        # ONE host copy for the whole batch, split per key host-side
        buf = np.asarray(packed)
        qscales = None
        if self._quantize and "__qmeta__" in self._layout:
            _, qlo, qhi, _, _ = self._layout["__qmeta__"]
            # [N, n_floats]; per key: scale[N, n], off[N, n]
            qscales = np.ascontiguousarray(buf[:, qlo:qhi]).view(np.float32)
        host, qoff = {}, 0
        for f, (shape, lo, hi, n_chan, chan_ax) in self._layout.items():
            if f == "__qmeta__":
                continue
            v = buf[:, lo:hi].reshape((buf.shape[0],) + shape)
            if qscales is not None and n_chan:
                sc = qscales[:, qoff : qoff + n_chan]
                ofv = qscales[:, qoff + n_chan : qoff + 2 * n_chan]
                qoff += 2 * n_chan
                bshape = [v.shape[0]] + [1] * (v.ndim - 1)
                if chan_ax is not None:
                    bshape[1 + chan_ax] = n_chan
                sc = sc.reshape(bshape)
                ofv = ofv.reshape(bshape)
                x = v.astype(np.float32) * sc + ofv
                v = np.where(v == -128, np.float32(np.nan), x)
            host[f] = v
        if "step_valid" in host:
            host["step_valid"] = host["step_valid"] > 0.5
        # the call succeeded: NOW advance stream cursors and trim history
        results = []
        for i in ready:
            st = self._streams[i]
            results.append(
                (i, st.next_seg, {k: v[i] for k, v in host.items()})
            )
            st.next_seg += 1
            keep_from = (
                st.next_seg * t.stride_samples - self._pre
            ) - st.stream_pos
            if keep_from > 0:
                st.buf = st.buf[keep_from:]
                st.stream_pos += keep_from
        return results

    def drain(self):
        """Poll until no stream has pending segments (e.g. after close)."""
        while True:
            got = self.poll()
            if not got:
                return
            yield from got
