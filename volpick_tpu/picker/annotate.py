"""annotate() / classify(): continuous-stream picking on TPU.

The product surface of the framework — the equivalent of the SeisBench
WaveformModel API the reference documents (reference `README.md:44-84`):

    picker = WaveformPicker(*from_pretrained("eqtransformer"))
    annotations = picker.annotate(stream, overlap=5500, blinding=(500, 500))
    output = picker.classify(stream, batch_size=256)   # → .picks / .detections

Pipeline (host work is only metadata/index bookkeeping):
1. group traces per instrument (net.sta.loc + band code), merge contiguous
   segments, zero-fill missing components, resample to the model rate;
2. compute window starts (stride = window − overlap, final window flush with
   the stream end);
3. on device, fused per batch: gather windows → demean/detrend + per-channel
   peak/std normalization → model forward → per-window probabilities;
4. overlap-average stacking with edge blinding back to continuous curves;
5. two-threshold trigger pick extraction (obspy trigger_onset semantics) with
   peak time/value per pick.

Steps 3-4 are jit-compiled once per (n_windows_bucket, window) shape; window
batches are padded to fixed chunk sizes so day-long, multi-station workloads
reuse a single executable.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volpick_tpu.core.picks import ClassifyOutput, Detection, Pick, PickList
from volpick_tpu.core.stream import Stream, Trace, UTC, group_streams_by_instrument
from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude
from volpick_tpu.ops.triggers import extract_triggers_batched
from volpick_tpu.ops.windows import (
    frame_windows,
    frame_windows_uniform,
    overlap_stack,
    overlap_stack_uniform,
    uniform_stack_weights,
    window_starts,
)


class WaveformPicker:
    """Batched continuous picking around a (model, params) pair."""

    def __init__(
        self,
        model,
        params,
        detrend: Optional[bool] = None,
        use_pallas: bool = False,
        precision: str = "float32",
        mesh=None,
        span_conditioning: Optional[bool] = None,
    ):
        self.model = model
        self.params = params
        # EQT conditions windows by detrend, PhaseNet by demean (reference
        # `volpick/model/models.py:263,664`)
        self.detrend = detrend if detrend is not None else model.name == "EQTransformer"
        # fused Pallas conditioning kernel (TPU only; XLA's fusion is already
        # close, the kernel saves one HBM pass on large window batches)
        self.use_pallas = use_pallas
        # span conditioning: inside the uniform fused scan, compute per-window
        # mean/LS-slope as ONE strided conv of the un-expanded span
        # (ops/signal.py condition_windows_from_span) instead of reducing over
        # the ~12x-expanded frames. Identical result up to conv accumulation
        # order (equality pinned in tests). Frozen at construction like the
        # other backend knobs; VOLPICK_SPAN_COND=0/1 overrides the default.
        if span_conditioning is None:
            env = os.environ.get("VOLPICK_SPAN_COND", "").strip()
            span_conditioning = env != "0" if env else True
        self.span_conditioning = bool(span_conditioning)
        # precision="bfloat16" runs the forward pass in bf16 (~1.6× on the
        # MXU); probability curves return as float32. Pick times shift by at
        # most a sample or two on smooth curves — use float32 for benchmark
        # parity work.
        if precision not in ("float32", "bfloat16"):
            raise ValueError(f"precision must be float32|bfloat16, got {precision!r}")
        self.precision = precision
        # multi-chip inference: shard the station axis of classify_arrays over
        # a Mesh(('data',)); params replicate, collectives ride ICI
        self.mesh = mesh
        # freeze backend-sensitive model knobs NOW (e.g. TPUPickNet's attn
        # implementation): compiled programs are cached in self._jitted, so a
        # post-construction env-var change must not silently disagree with an
        # already-compiled executable; a mesh-sharded program pins "xla"
        if hasattr(model, "resolve_attn"):
            model.attn = model.resolve_attn(sharded=mesh is not None)
        self._jitted: Dict = {}

    # ------------------------------------------------------------------ utils
    @property
    def in_samples(self) -> int:
        return self.model.in_samples

    @property
    def phases(self) -> List[str]:
        return [p for p in self.model.phases]

    def _prob_channels(self) -> List[str]:
        """Output channel names in prediction order."""
        if self.model.name == "VolEQTransformer":
            return ["Detection_rg", "Detection_lp", "P", "S"]
        if self.model.name == "EQTransformer":
            return ["Detection", "P", "S"]
        return list(self.model.phases)  # e.g. P, S, N

    def _default_batch_size(self) -> int:
        """Per-architecture forward-chunk optimum for the fused scan
        ("classify_chunks" sweeps, docs/TPU_PROBE.jsonl). Dispatches on the
        model-level `default_classify_batch` attribute (models that need a
        non-256 chunk declare it; subclasses inherit it) with 256 — the
        EQTransformer/PhaseNet optimum — as the fallback. An explicit
        `batch_size` always wins."""
        return int(getattr(self.model, "default_classify_batch", 256))

    def _apply_model(self, params, frames: jnp.ndarray) -> jnp.ndarray:
        """Conditioned (N, C, window) windows → (N, K, window) float32 probs,
        at the configured precision (trace-time; cast fuses into the graph)."""
        if self.precision == "bfloat16":
            params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
            frames = frames.astype(jnp.bfloat16)
        out = self.model.apply(params, frames)
        if isinstance(out, tuple):  # EQT family: per-head (N, window) outputs
            out = jnp.stack(out, axis=1)
        return out.astype(jnp.float32)

    def _forward_windows(self, frames: jnp.ndarray) -> jnp.ndarray:
        return self._apply_model(self.params, frames)

    def _condition(self, frames: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas and frames.shape[0] % 8 == 0:
            from volpick_tpu.ops.pallas.conditioning import condition_windows_pallas

            return condition_windows_pallas(frames, detrend=self.detrend, norm=self.model.norm)
        if self.detrend:
            frames = detrend_linear(frames)
        else:
            frames = demean(frames)
        return normalize_amplitude(frames, norm=self.model.norm, per_channel=True)

    def _get_jitted(self, chunk: int):
        if chunk not in self._jitted:

            @jax.jit
            def run(params, frames):
                frames = self._condition(frames)
                return self._apply_model(params, frames)

            self._jitted[chunk] = run
        return self._jitted[chunk]

    # ------------------------------------------------------- fused device path
    def _curves_body(
        self,
        n_win: int,
        total: int,
        blinding: Tuple[int, int],
        stacking: str,
        chunk: int,
        stride: Optional[int],
        flush_start: Optional[int],
    ):
        """The shared frame → condition → forward → overlap-average stack
        with blinding program, as a traceable python function
        (params, data, starts) → (S, K, total) curves. Both classify (which
        appends trigger extraction) and annotate (which returns the curves)
        jit this same body, so the two surfaces consume the identical window
        set and stacking math by construction.

        With a uniform `stride` (any value; window starts are derived as
        i·stride, overriding `starts`), the whole pipeline is ONE lax.scan
        carrying the stacked-curve accumulator: each step slices its
        contiguous stream span, frames it gather-free in the body, runs the
        model, and adds its locally-stacked contribution at a per-step
        offset, with host-precomputed static stacking weights
        (`uniform_stack_weights`). The ~ceil(window/stride)-times-expanded
        framed windows and the per-window predictions never materialize in
        HBM. Tiny strides (unroll factor ceil(window/stride) > 64) fall back
        to gather framing + the fused-scatter stack. `flush_start` (static) adds one final
        window flush with the stream end at total - window — SeisBench's
        annotate places this extra window whenever the uniform grid does not
        end exactly at the last sample (reference `README.md:54-62`); its
        contribution is composed into the uniform sums via a static-offset
        add, so the fast path is kept for the uniform prefix."""
        window = self.in_samples
        n_uni = n_win - (1 if flush_start is not None else 0)
        l, r = blinding

        # tiny strides would unroll ceil(window/stride) shifted adds; use the
        # single fused scatter instead
        use_uniform = stride is not None and -(-window // max(stride or 1, 1)) <= 64

        def curves_of(params, data, starts):
            s, c = data.shape[0], data.shape[1]

            def fwd(fr):
                fr = self._condition(fr)
                return self._apply_model(params, fr)

            if use_uniform:
                # Fully fused frame → condition → forward → stack as ONE
                # scan: each step dynamic-slices its contiguous span of the
                # raw stream, builds its windows gather-free in the body,
                # runs the model, and accumulates its stacked contribution
                # into the carried curve accumulator at a per-step offset.
                # Neither the framed windows (~12x the stream at 500/6000
                # stride/window) nor the per-window predictions ever
                # materialize in HBM. Stacking weights are input-independent,
                # so they are precomputed on host (`uniform_stack_weights`)
                # and the scan carries only the probability sums. Chunks are
                # window-major (all stations per window index) so one step's
                # windows share one contiguous span.
                k_ch = len(self._prob_channels())
                m = max(-(-window // stride), 1)
                wpc = max(1, chunk // s)  # window indices per scan step
                n_steps = -(-n_uni // wpc)
                # balance the steps: with n_steps fixed, shrink wpc to
                # ceil(n_uni/n_steps) so the last step's zero-masked padding
                # windows mostly disappear (chunk 256 on the 8x229-window
                # bench workload computed 2048 windows for 1832 useful, a
                # 10.5% pure waste; balanced wpc=29 computes 1856)
                wpc = max(1, -(-n_uni // n_steps))
                span = (wpc - 1) * stride + window
                need = (n_steps - 1) * wpc * stride + span
                total_in = data.shape[-1]
                datap = (
                    jnp.pad(data, ((0, 0), (0, 0), (0, need - total_in)))
                    if need > total_in
                    else data
                )
                local_len = (wpc + m - 1) * stride
                acc_len = max((n_steps * wpc + m - 1) * stride, total)

                # span conditioning (see __init__): per-window stats from
                # stride-block partial sums of the raw span instead of
                # reductions over the expanded frames. ONLY when stride
                # divides the window (EQT 6000/500) — the general strided-conv
                # stats path measured 85k vs 127k windows/s on EQT and 332k vs
                # 503k on PhaseNet (3001-tap HIGHEST conv; TPU_PROBE bench_ab)
                # — and not under use_pallas (that path conditions in-kernel)
                span_cond = (self.span_conditioning and not self.use_pallas
                             and window % stride == 0)

                def step(acc, i):
                    sp = jax.lax.dynamic_slice_in_dim(
                        datap, i * (wpc * stride), span, axis=-1
                    )  # (S, C, span)
                    if span_cond:
                        from volpick_tpu.ops.signal import condition_windows_from_span

                        fr = condition_windows_from_span(
                            sp, wpc, stride, window,
                            detrend=self.detrend, norm=self.model.norm,
                        )
                        pr = self._apply_model(params, fr.reshape(wpc * s, c, window))
                    else:
                        fr = frame_windows_uniform(sp, wpc, stride, window)
                        pr = fwd(fr.reshape(wpc * s, c, window))
                    pr = pr.reshape(wpc, s, k_ch, window)
                    # zero the padded window indices of the final step
                    # (their static stacking weight is zero too)
                    wmask = ((i * wpc + jnp.arange(wpc)) < n_uni).astype(pr.dtype)
                    pr = pr * wmask[:, None, None, None]
                    loc = jax.vmap(
                        lambda q: overlap_stack_uniform(
                            q, stride, blinding=blinding, stacking=stacking,
                            return_sums=True,
                        )[0]
                    )(jnp.moveaxis(pr, 1, 0))  # (S, K, local_len)
                    cur = jax.lax.dynamic_slice_in_dim(
                        acc, i * (wpc * stride), local_len, axis=-1
                    )
                    upd = cur + loc if stacking == "avg" else jnp.maximum(cur, loc)
                    acc = jax.lax.dynamic_update_slice_in_dim(
                        acc, upd, i * (wpc * stride), axis=-1
                    )
                    return acc, None

                acc0 = jnp.zeros((s, k_ch, acc_len), dtype=jnp.float32)
                acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_steps))

                wgt = uniform_stack_weights(n_uni, stride, window, blinding, acc_len)
                if flush_start is not None:
                    # flush_start + window == total: a static-offset slice add
                    fl = jax.lax.slice_in_dim(
                        data, flush_start, flush_start + window, axis=-1
                    )  # (S, C, window)
                    fmask = np.zeros((window,), dtype=np.float32)
                    fmask[l : window - r if r else window] = 1.0
                    flc = fwd(fl) * jnp.asarray(fmask)[None, None, :]
                    sl = (slice(None), slice(None),
                          slice(flush_start, flush_start + window))
                    if stacking == "avg":
                        acc = acc.at[sl].add(flc)
                        wgt = wgt.copy()
                        wgt[flush_start : flush_start + window] += fmask
                    else:
                        acc = acc.at[sl].max(flc)
                acc = acc[..., :total]
                if stacking == "avg":
                    return acc / jnp.asarray(
                        np.maximum(wgt[:total], 1.0)
                    )[None, None, :]
                return acc

            # non-uniform fallback: gather framing + scatter stacking
            frames = frame_windows(data, starts, window)  # (N, S, C, window)
            frames = jnp.moveaxis(frames, 0, 1).reshape(s * n_win, c, window)
            n_frames = s * n_win
            pad = (-n_frames) % chunk
            frames = jnp.pad(frames, ((0, pad), (0, 0), (0, 0)))
            frames = frames.reshape(-1, chunk, c, window)
            preds = jax.lax.map(fwd, frames)
            k = preds.shape[2]
            preds = preds.reshape(-1, k, window)[:n_frames].reshape(s, n_win, k, window)
            curves = jax.vmap(
                lambda q: overlap_stack(q, starts, total, blinding=blinding, stacking=stacking)
            )(preds)  # (S, K, total)
            return curves

        return curves_of

    def _jit_sharded(self, fn):
        """jit with the station axis sharded over the mesh (if configured)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            sh = NamedSharding(self.mesh, P("data"))
            return jax.jit(fn, in_shardings=(repl, sh, repl))
        return jax.jit(fn)

    def _fused_classify_fn(
        self,
        n_stations: int,
        n_win: int,
        total: int,
        blinding: Tuple[int, int],
        stacking: str,
        thresholds: Tuple[float, ...],
        max_picks: int,
        chunk: int,
        stride: Optional[int] = None,
        flush_start: Optional[int] = None,
    ):
        """One jitted program: the shared curves body (`_curves_body`) +
        two-threshold trigger extraction. Only (max_picks)-sized pick buffers
        leave the device — the speed-of-light path for continuous picking."""
        key = (n_stations, n_win, total, blinding, stacking, thresholds, max_picks, chunk,
               stride, flush_start)
        cache = self._jitted.setdefault("fused", {})
        if key in cache:
            return cache[key]
        channels = self._prob_channels()
        curves_of = self._curves_body(
            n_win, total, blinding, stacking, chunk, stride, flush_start
        )

        def run(params, data, starts):
            s = data.shape[0]
            curves = curves_of(params, data, starts)
            # all triggerable channels extract in ONE batched call with
            # per-row thresholds (the single-scan extractor dominates the
            # profile; see docs/TPU_PROBE.jsonl breakdown stage)
            trig = [
                (label, ki, thr)
                for ki, (label, thr) in enumerate(zip(channels, thresholds))
                if label != "N"  # noise channel is never triggered on
            ]
            flat = jnp.concatenate([curves[:, ki] for _, ki, _ in trig], axis=0)
            thr_rows = jnp.concatenate(
                [jnp.full((s,), t, dtype=flat.dtype) for _, _, t in trig]
            )
            res = extract_triggers_batched(flat, thr_rows, max_picks=max_picks)
            out = {}
            for j, (label, _, _) in enumerate(trig):
                out[label] = tuple(a[j * s : (j + 1) * s] for a in res)
            return out

        run = self._jit_sharded(run)
        cache[key] = run
        return run

    def _fused_annotate_fn(
        self,
        n_stations: int,
        n_win: int,
        total: int,
        blinding: Tuple[int, int],
        stacking: str,
        chunk: int,
        stride: Optional[int] = None,
        flush_start: Optional[int] = None,
    ):
        """The curves program alone, jitted: (params, data, starts) →
        (S, K, total) stacked probability curves. Same body as classify."""
        key = ("ann", n_stations, n_win, total, blinding, stacking, chunk, stride,
               flush_start)
        cache = self._jitted.setdefault("fused", {})
        if key in cache:
            return cache[key]
        run = self._jit_sharded(
            self._curves_body(n_win, total, blinding, stacking, chunk, stride, flush_start)
        )
        cache[key] = run
        return run

    def classify_arrays(
        self,
        data: np.ndarray,
        thresholds: Dict[str, float],
        overlap: Optional[int] = None,
        blinding: Tuple[int, int] = (0, 0),
        stacking: str = "avg",
        batch_size: Optional[int] = None,
        max_picks: Optional[int] = None,
        max_span: int = 500_000,
    ) -> Dict[str, tuple]:
        """Fused device classify on a station batch (S, C, W_total).

        Returns {label: (peak_idx, peak_val, valid, on_idx, off_idx)} numpy
        arrays, each (S, n_picks). Used by classify(); also the public
        array-level API for production serving loops.

        Streams longer than `max_span` samples (default ~83 min at 100 Hz;
        all segments share one shape so the program compiles once) are
        processed as overlapping stride-aligned segments and stitched exactly: each segment includes a
        full window of lookahead/lookbehind context, and a pick is owned by
        the segment whose core region contains its peak — the same
        finality argument as the streaming picker, so results match a single
        full-stream pass while bounding device memory and compile size
        (a day of 100 Hz data is ~8.6M samples)."""
        s, c, total = data.shape
        if batch_size is None:
            batch_size = self._default_batch_size()
        window = self.in_samples
        if overlap is None:
            overlap = window // 2
        stride = window - overlap
        if total > max_span:
            ctx = (-(-window // stride)) * stride  # window rounded up to grid
            core = max(((max_span - 2 * ctx) // stride) * stride, stride)
            merged: Dict[str, list] = {}
            seg_start = 0
            while seg_start < total:
                own_lo = seg_start
                own_hi = min(seg_start + core, total)
                g_lo = max(seg_start - ctx, 0)
                g_hi = min(own_hi + ctx, total)
                res = self.classify_arrays(
                    data[..., g_lo:g_hi],
                    thresholds,
                    overlap=overlap,
                    blinding=blinding,
                    stacking=stacking,
                    batch_size=batch_size,
                    max_picks=max_picks,
                    max_span=2**62,
                )
                for label, (pk, val, valid, on, off) in res.items():
                    own = valid & (pk + g_lo >= own_lo) & (pk + g_lo < own_hi)
                    merged.setdefault(label, []).append(
                        (pk + g_lo, val, own, on + g_lo, off + g_lo)
                    )
                seg_start = own_hi
            return {
                label: tuple(np.concatenate([seg[i] for seg in segs], axis=1) for i in range(5))
                for label, segs in merged.items()
            }
        data, padded_total, starts, flush_start = self._plan_windows(data, overlap)
        if max_picks is None:
            max_picks = min(max(32, padded_total // window * 4), 4096)
        channels = self._prob_channels()
        # the noise row never triggers; any other missing label is a caller
        # mistake and must fail loudly, not silently produce zero picks
        thr = tuple(
            thresholds.get(lab, 2.0) if lab == "N" else thresholds[lab] for lab in channels
        )
        run = self._fused_classify_fn(
            s,
            len(starts),
            padded_total,
            tuple(blinding),
            stacking,
            thr,
            max_picks,
            batch_size,
            stride=stride,
            flush_start=flush_start,
        )
        out = run(self.params, jnp.asarray(data, dtype=jnp.float32), jnp.asarray(starts))
        return {k: tuple(np.asarray(a) for a in v) for k, v in out.items()}

    # ------------------------------------------------------------ array level
    def _plan_windows(self, data: np.ndarray, overlap: int):
        """SeisBench window placement shared by classify and annotate: a
        uniform grid at i·stride plus, when the grid does not end exactly at
        the last sample, one final window flush with the stream end
        (reference `README.md:54-62`). Streams shorter than one window are
        zero-padded to a single window. Returns
        (data, padded_total, starts, flush_start)."""
        window = self.in_samples
        stride = window - overlap
        total = data.shape[-1]
        if total <= window:
            padded_total = window
            if padded_total > total:
                data = np.pad(data, ((0, 0), (0, 0), (0, padded_total - total)))
            return data, padded_total, np.array([0], dtype=np.int64), None
        starts = window_starts(total, window, overlap)
        flush_start = (
            int(starts[-1])
            if len(starts) >= 2 and int(starts[-1]) != (len(starts) - 1) * stride
            else None
        )
        return data, total, starts, flush_start

    def annotate_array(
        self,
        data: np.ndarray,
        overlap: Optional[int] = None,
        blinding: Tuple[int, int] = (0, 0),
        stacking: str = "avg",
        batch_size: Optional[int] = None,
    ) -> np.ndarray:
        """Continuous probability curves for raw arrays.

        data: (S, C, W_total) station batch at the model sampling rate.
        Returns (S, K, W_total) stacked probability curves. This is the fully
        batched multi-station path (BASELINE config 3); it rides the same
        fused frame→condition→forward→stack program as classify_arrays
        (`_curves_body`), so the two surfaces cannot drift apart.
        """
        s, c, total = data.shape
        if batch_size is None:
            batch_size = self._default_batch_size()
        window = self.in_samples
        if overlap is None:
            overlap = window // 2
        stride = window - overlap
        data, padded_total, starts, flush_start = self._plan_windows(data, overlap)
        run = self._fused_annotate_fn(
            s,
            len(starts),
            padded_total,
            tuple(blinding),
            stacking,
            batch_size,
            stride=stride,
            flush_start=flush_start,
        )
        curves = np.asarray(
            run(self.params, jnp.asarray(data, dtype=jnp.float32), jnp.asarray(starts))
        )
        return curves[..., :total]

    # ----------------------------------------------------------- stream level
    def _group_arrays(self, stream: Stream):
        """Instrument groups → (key, data (C, W), t0, sampling_rate)."""
        sr = self.model.sampling_rate
        order = self.model.component_order
        out = []
        for key, group in group_streams_by_instrument(stream).items():
            group = Stream([tr.copy() for tr in group]).merge_overlaps()
            for tr in group:
                if abs(tr.stats.sampling_rate - sr) > 1e-6:
                    tr.resample(sr)
            # align by earliest start; zero-fill missing components
            t0 = min(tr.stats.starttime.timestamp for tr in group)
            t1 = max(tr.stats.endtime.timestamp for tr in group)
            total = int(round((t1 - t0) * sr)) + 1
            data = np.zeros((len(order), total), dtype=np.float32)
            for tr in group:
                comp = tr.stats.channel[-1] if tr.stats.channel else ""
                if comp not in order:
                    continue
                ci = order.index(comp)
                off = int(round((tr.stats.starttime.timestamp - t0) * sr))
                n = min(tr.stats.npts, total - off)
                data[ci, off : off + n] = tr.data[:n]
            out.append((key, data, UTC(t0), sr))
        return out

    def annotate(
        self,
        stream: Stream,
        overlap: Optional[int] = None,
        blinding: Tuple[int, int] = (0, 0),
        stacking: str = "avg",
        batch_size: Optional[int] = None,
    ) -> Stream:
        """Probability-curve Stream for each instrument group.

        Output trace channels are named "<ModelName>_<label>" (e.g.
        "EQTransformer_P"), one set per instrument, sampled at the model rate.
        """
        groups = self._group_arrays(stream)
        ann = Stream()
        if not groups:
            return ann
        # batch equal-length groups together for the multi-station fast path
        by_len: Dict[int, List] = {}
        for g in groups:
            by_len.setdefault(g[1].shape[-1], []).append(g)
        for total, gs in by_len.items():
            data = np.stack([g[1] for g in gs])
            curves = self.annotate_array(
                data, overlap=overlap, blinding=blinding, stacking=stacking, batch_size=batch_size
            )
            for (key, _, t0, sr), c in zip(gs, curves):
                net, sta, loc, _ = (key.split(".") + ["", "", "", ""])[:4]
                for ki, label in enumerate(self._prob_channels()):
                    ann.append(
                        Trace(
                            c[ki],
                            dict(
                                network=net,
                                station=sta,
                                location=loc,
                                channel=f"{self.model.name}_{label}",
                                sampling_rate=sr,
                                starttime=t0,
                            ),
                        )
                    )
        return ann

    def classify(
        self,
        stream: Stream,
        P_threshold: Optional[float] = None,
        S_threshold: Optional[float] = None,
        detection_threshold: Optional[float] = None,
        overlap: Optional[int] = None,
        blinding: Tuple[int, int] = (0, 0),
        stacking: str = "avg",
        batch_size: Optional[int] = None,
    ) -> ClassifyOutput:
        """Pick (and detect) on a continuous Stream.

        Thresholds default to the model's shipped `default_args` (reference
        `Final_models/volpick/*/volpick.json.v1`). Pick extraction uses
        trigger_onset(prob, thr, thr/2) + in-trigger argmax semantics
        (reference `volpick/model/eval_taks0.py:46-56`).
        """
        d = self.model.default_args
        P_threshold = P_threshold if P_threshold is not None else d.get("P_threshold", 0.3)
        S_threshold = S_threshold if S_threshold is not None else d.get("S_threshold", 0.3)
        detection_threshold = (
            detection_threshold
            if detection_threshold is not None
            else d.get("detection_threshold", 0.3)
        )

        picks = PickList()
        detections: List[Detection] = []
        groups = self._group_arrays(stream)
        if not groups:
            return ClassifyOutput(self.model.name, picks, detections)
        thresholds = {
            "P": P_threshold,
            "S": S_threshold,
            "Detection": detection_threshold,
            # VolEQTransformer's per-type detection heads share the threshold
            "Detection_rg": detection_threshold,
            "Detection_lp": detection_threshold,
            "N": 2.0,  # noise channel never triggers
        }
        by_len: Dict[int, List] = {}
        for g in groups:
            by_len.setdefault(g[1].shape[-1], []).append(g)
        for total, gs in by_len.items():
            data = np.stack([g[1] for g in gs])
            results = self.classify_arrays(
                data,
                thresholds,
                overlap=overlap,
                blinding=blinding,
                stacking=stacking,
                batch_size=batch_size,
            )
            for gi, (key, _, t0, sr) in enumerate(gs):
                trace_id = key.rsplit(".", 1)[0]  # net.sta.loc
                for label, (pk, val, valid, on, off) in results.items():
                    if label == "N":
                        continue
                    for j in np.where(valid[gi])[0]:
                        # a trigger in the zero-padded tail (streams shorter
                        # than one window) is not real data: drop picks whose
                        # onset OR peak lies past the stream end, and clamp
                        # the trigger end to the last real sample
                        if on[gi, j] >= total or pk[gi, j] >= total:
                            continue
                        end = min(int(off[gi, j]), total - 1)
                        if label.startswith("Detection"):
                            detections.append(
                                Detection(
                                    trace_id=trace_id,
                                    start_time=t0 + on[gi, j] / sr,
                                    end_time=t0 + end / sr,
                                    peak_value=float(val[gi, j]),
                                )
                            )
                        else:
                            picks.append(
                                Pick(
                                    trace_id=trace_id,
                                    start_time=t0 + on[gi, j] / sr,
                                    end_time=t0 + end / sr,
                                    peak_time=t0 + pk[gi, j] / sr,
                                    peak_value=float(val[gi, j]),
                                    phase=label,
                                )
                            )
        picks.sort()
        return ClassifyOutput(self.model.name, picks, detections)
