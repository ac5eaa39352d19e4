"""Host-side batch assembly feeding the on-device augmentation program.

The host's only jobs are: keep the raw traces in pinned numpy buffers, draw
shuffled indices, and ship fixed-shape (B, C, W_buf) batches to the device —
everything else (windowing, labels, stacking, normalization) runs in
`augment_train_batch` on the TPU. This replaces the reference's
12-24-worker torch DataLoader + per-sample numpy augmentation pipeline
(reference `volpick/model/train.py:315-330`).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from volpick_tpu.pipeline.augmentations import AugmentConfig, augment_train_batch

# metadata column → phase map (reference `volpick/model/models.py:26-31`)
PHASE_COLUMNS = {
    "trace_p_arrival_sample": "P",
    "trace_P_arrival_sample": "P",
    "trace_s_arrival_sample": "S",
    "trace_S_arrival_sample": "S",
}


def _onset_arrays(metadata, target_rate=None) -> Tuple[np.ndarray, np.ndarray]:
    """(p, s) float arrays with NaN for absent picks, merging column aliases.

    With `target_rate`, arrival samples stored at a different
    trace_sampling_rate_hz are rescaled to the target rate — matching the
    rescaling `WaveformDataset.get_sample` applies to the waveforms these
    onsets are compared against."""
    n = len(metadata)
    p = np.full(n, np.nan, dtype=np.float32)
    s = np.full(n, np.nan, dtype=np.float32)
    for col, phase in PHASE_COLUMNS.items():
        if col in metadata.columns:
            vals = np.asarray(metadata[col], dtype=np.float32)
            tgt = p if phase == "P" else s
            take = np.isnan(tgt) & ~np.isnan(vals)
            tgt[take] = vals[take]
    if target_rate is not None and "trace_sampling_rate_hz" in metadata.columns:
        sr = np.asarray(metadata["trace_sampling_rate_hz"], dtype=np.float32)
        scale = np.where(np.isnan(sr) | (sr <= 0), 1.0, float(target_rate) / sr)
        p *= scale
        s *= scale
    return p, s


def select_window_offsets_host(
    rng: np.random.Generator,
    lens: np.ndarray,
    p: np.ndarray,
    s: np.ndarray,
    cfg: AugmentConfig,
) -> np.ndarray:
    """Per-trace training-window start offsets, drawn on the HOST.

    The selection distribution is the device window block's
    (WindowAroundSample gate -> RandomWindow | null window, reference
    `volpick/model/models.py:221-265`) and depends only on (len, p, s, rng) —
    never on waveform content — so it can run host-side from metadata alone.
    Draw order is fixed ([pick_s?], null-onset, gate, u) so the host-crop and
    device-crop generator modes consume the numpy RNG identically."""
    b = lens.shape[0]
    has_p, has_s = ~np.isnan(p), ~np.isnan(s)
    if cfg.selection == "first":
        base = np.where(has_p, np.nan_to_num(p, nan=np.inf), np.inf)
        base = np.minimum(base, np.where(has_s, np.nan_to_num(s, nan=np.inf), np.inf))
        onset = np.where(np.isfinite(base), base, 0.0)
    else:  # random among present picks
        pick_s = rng.random(b) < 0.5
        both = has_p & has_s
        use_s = (both & pick_s) | (has_s & ~has_p)
        onset = np.where(use_s, np.nan_to_num(s), np.nan_to_num(p))
    onset = np.where(has_p | has_s, onset, rng.random(b) * lens.astype(np.float32))

    was_start = onset.astype(np.int32) - cfg.samples_before
    gate = rng.random(b) < cfg.window_around_prob
    u = rng.random(b)
    span_was = max(cfg.pre_window - cfg.window, 0)
    off_was = was_start + np.floor(u * (span_was + 1)).astype(np.int32)
    lo = cfg.low if cfg.low is not None else 0
    hi = lens.astype(np.int32) if cfg.high is None else np.minimum(lens.astype(np.int32), cfg.high)
    span_null = np.maximum(hi - lo - cfg.window, 0)
    off_null = lo + np.floor(u * (span_null + 1).astype(np.float32)).astype(np.int32)
    return np.where(gate, off_was, off_null).astype(np.int64)


def host_window_crop(rng: np.random.Generator, batch: Dict[str, np.ndarray], cfg: AugmentConfig) -> Dict[str, np.ndarray]:
    """Numpy mirror of the device window block (`augmentations.select_window_offsets`
    + `gather_window`): select each trace's training window on the HOST and crop
    to (B, C, window) before shipping.

    Window selection depends only on (len, p, s, rng) — never on waveform
    content — so doing it host-side is pure data movement: the bytes crossing
    the host→device link shrink from the padded trace length to the model
    window (4x for 120 s traces feeding a 30 s window; the stacking program
    ships 5 batches per step, so this bounds the training input bandwidth).
    The device program then runs with `cfg.pre_windowed=True`, making its
    window block an identity gather at offset 0. Same sampling distribution
    as the device block (WindowAroundSample gate -> RandomWindow | Null
    random window, reference `volpick/model/models.py:221-265`); the realized
    draws come from the generator's numpy RNG instead of the jax key.
    """
    x, lens, p, s = batch["x"], batch["len"], batch["p"], batch["s"]
    off = select_window_offsets_host(rng, lens, p, s, cfg)
    b = lens.shape[0]
    w = cfg.window
    idx = off[:, None] + np.arange(w)[None, :]  # (B, w)
    valid = (idx >= 0) & (idx < lens[:, None]) & (idx < x.shape[-1])
    idx_c = np.clip(idx, 0, x.shape[-1] - 1)
    out = np.take_along_axis(x, np.broadcast_to(idx_c[:, None, :], (b, x.shape[1], w)), axis=-1)
    out = np.where(valid[:, None, :], out, 0.0).astype(np.float32)

    res = dict(batch)
    res["x"] = out
    res["len"] = np.full(b, w, dtype=np.int32)
    res["p"] = (p - off).astype(np.float32)  # NaN propagates for absent picks
    res["s"] = (s - off).astype(np.float32)
    return res


@partial(jax.jit, static_argnames=("window",))
def device_gather_crop(pool, idx, off, lens, window: int):
    """Crop (B, C, window) training windows out of a DEVICE-RESIDENT trace
    pool: gather rows by `idx`, slice at per-row `off`, zero outside
    [0, len) — the device-side half of `host_window_crop` (same clip+mask
    semantics, bit-identical output).

    With the pool uploaded once, the per-step host->device traffic shrinks
    from (B, C, window) waveforms to a few (B,) index/offset vectors — over
    the axon tunnel (~30 MB/s, and the client retains every uploaded buffer)
    this is the difference between tunnel-bound ~46 MB/step training and
    KB/step, and it bounds host RSS on long runs."""
    rows = jnp.take(pool, idx, axis=0)  # (B, C, L)
    pos = off[:, None] + jnp.arange(window, dtype=off.dtype)  # (B, w)
    valid = (pos >= 0) & (pos < lens[:, None]) & (pos < pool.shape[-1])
    posc = jnp.clip(pos, 0, pool.shape[-1] - 1)
    out = jnp.take_along_axis(
        rows,
        jnp.broadcast_to(posc[:, None, :], (rows.shape[0], rows.shape[1], window)),
        axis=-1,
    )
    return jnp.where(valid[:, None, :], out, 0.0)


class RawBatchSource:
    """Raw padded trace buffers + onset arrays for random batch draws.

    Small datasets are preloaded into one pinned numpy buffer (the
    reference's cache="full" behavior); datasets above `preload_limit_bytes`
    stay on disk and batches are read from the bucketed HDF5 on demand, so
    VCSEIS-scale data trains without a RAM blowup."""

    def __init__(
        self,
        dataset,
        buffer_len: Optional[int] = None,
        pad_multiple: int = 512,
        preload: Optional[bool] = None,
        preload_limit_bytes: int = 4 << 30,
    ):
        self.dataset = dataset
        n = len(dataset)
        self.p, self.s = _onset_arrays(dataset.metadata, target_rate=dataset.sampling_rate)
        # per-trace LP flag for event-type detection heads
        # (EventTypeDetectionLabeller semantics, reference `models.py:1376-1456`)
        st = dataset.metadata.get("source_type")
        if st is not None:
            lp = st.astype(str).str.lower().isin({"lp", "long period", "long-period"})
            self.is_lp = lp.to_numpy().astype(np.float32)
        else:
            self.is_lp = np.zeros(n, dtype=np.float32)

        # probe a few traces for shape bookkeeping
        probe = [dataset.get_sample(i)[0] for i in range(min(n, 8))]
        c = probe[0].shape[0] if probe else 3
        self.n_channels = c
        probe_max = max((w.shape[-1] for w in probe), default=pad_multiple)

        est_bytes = n * c * probe_max * 4
        if preload is None:
            preload = est_bytes <= preload_limit_bytes
        self.preloaded = preload

        if preload:
            waves = probe + [dataset.get_sample(i)[0] for i in range(len(probe), n)]
            self.lens = np.array([w.shape[-1] for w in waves], dtype=np.int32)
            max_len = int(self.lens.max()) if n else pad_multiple
            if buffer_len is None:
                buffer_len = int(math.ceil(max_len / pad_multiple) * pad_multiple)
            self.buffer_len = buffer_len
            self.data = np.zeros((n, c, buffer_len), dtype=np.float32)
            for i, w in enumerate(waves):
                self.data[i, :, : min(w.shape[-1], buffer_len)] = w[:, :buffer_len]
            self.lens = np.minimum(self.lens, buffer_len)
        else:
            self.data = None
            if buffer_len is None:
                # size the buffer from metadata, not the 8-trace probe: a
                # longer trace later in the table would otherwise be silently
                # truncated while its onsets point past the buffered data
                meta_max = self._max_len_from_metadata(dataset)
                buffer_len = int(
                    math.ceil(max(probe_max, meta_max, 1) / pad_multiple) * pad_multiple
                )
            self.buffer_len = buffer_len
            self.lens = None  # filled per batch
        self._n = n
        self._pool = None  # device-resident copy of self.data (device_pool)

    @staticmethod
    def _max_len_from_metadata(dataset) -> int:
        """Upper bound on trace length at the dataset sampling rate.

        Uses `trace_npts` when present; falls back to the `:W` slice in
        SeisBench bucket references ("bucket0$3,:3,:6000"). Lengths stored at
        a different trace_sampling_rate_hz are rescaled to the target rate
        (matching get_sample's waveform rescaling)."""
        md = dataset.metadata
        n = len(md)
        lens = np.zeros(n, dtype=np.float64)
        if "trace_npts" in md.columns:
            vals = np.asarray(pd.to_numeric(md["trace_npts"], errors="coerce"))
            lens = np.where(np.isnan(vals), 0.0, vals)
        else:
            names = md.get("trace_name")
            if names is not None:
                spec = names.astype(str).str.extract(r",:(\d+)$")[0]
                vals = np.asarray(pd.to_numeric(spec, errors="coerce"))
                lens = np.where(np.isnan(vals), 0.0, vals)
        target = getattr(dataset, "sampling_rate", None)
        if target and "trace_sampling_rate_hz" in md.columns:
            sr = np.asarray(pd.to_numeric(md["trace_sampling_rate_hz"], errors="coerce"))
            scale = np.where(np.isnan(sr) | (sr <= 0), 1.0, float(target) / sr)
            lens = lens * scale
        return int(math.ceil(lens.max())) if n else 0

    def __len__(self):
        return self._n

    @staticmethod
    def _mask_onsets_beyond(onsets: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """NaN out onsets that fall past the buffered data (truncated traces
        must not paint labels over zeroed waveform)."""
        return np.where(onsets >= lens.astype(np.float32), np.nan, onsets)

    def take(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        if self.preloaded:
            lens = self.lens[idx]
            return {
                "x": self.data[idx],
                "len": lens,
                "p": self._mask_onsets_beyond(self.p[idx], lens),
                "s": self._mask_onsets_beyond(self.s[idx], lens),
                "is_lp": self.is_lp[idx],
            }
        b = len(idx)
        x = np.zeros((b, self.n_channels, self.buffer_len), dtype=np.float32)
        lens = np.zeros(b, dtype=np.int32)
        for j, i in enumerate(idx):
            w = self.dataset.get_sample(int(i))[0]
            m = min(w.shape[-1], self.buffer_len)
            x[j, :, :m] = w[:, :m]
            lens[j] = m
        return {
            "x": x,
            "len": lens,
            "p": self._mask_onsets_beyond(self.p[idx], lens),
            "s": self._mask_onsets_beyond(self.s[idx], lens),
            "is_lp": self.is_lp[idx],
        }

    def random_batch(self, rng: np.random.Generator, batch_size: int) -> Dict[str, np.ndarray]:
        idx = rng.integers(0, len(self), size=batch_size)
        return self.take(idx)

    @property
    def pool_bytes(self) -> int:
        """Bytes a device-resident copy of the trace pool would occupy."""
        return int(self.data.nbytes) if self.preloaded else 0

    def device_pool(self):
        """The full trace pool as ONE device array, uploaded lazily once.

        Only available for preloaded sources; callers gate on `preloaded`
        (and a byte budget) before choosing the device-crop generator mode."""
        if not self.preloaded:
            raise ValueError("device_pool requires a preloaded source")
        if self._pool is None:
            self._pool = jax.device_put(self.data)
        return self._pool

    def take_meta(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Host metadata for rows `idx` (no waveform copy): the inputs the
        window-offset draw needs plus the label onsets, matching `take`'s
        masking semantics."""
        if not self.preloaded:
            raise ValueError("take_meta requires a preloaded source")
        lens = self.lens[idx]
        return {
            "idx": np.asarray(idx, dtype=np.int32),
            "len": lens,
            "p": self._mask_onsets_beyond(self.p[idx], lens),
            "s": self._mask_onsets_beyond(self.s[idx], lens),
            "is_lp": self.is_lp[idx],
        }


class TrainGenerator:
    """Epoch iterator: shuffled primary batches + random secondary/noise draws,
    augmented on device. Yields {"X", "y"[, "detections"]} jnp arrays."""

    def __init__(
        self,
        dataset,
        cfg: AugmentConfig,
        batch_size: int,
        eq_dataset=None,
        noise_dataset=None,
        seed: int = 42,
        drop_last: bool = True,
        prefetch: int = 2,
        host_window: bool = True,
        device_data: Optional[bool] = None,
        device_pool_budget: int = 4 << 30,
    ):
        self.cfg = cfg
        # host-side window pre-crop: ship (B, C, window) instead of padded
        # full traces (see host_window_crop); the device program's window
        # block degenerates to an identity gather
        self.host_window = host_window
        self.batch_size = batch_size
        self.primary = RawBatchSource(dataset)
        self.eq = RawBatchSource(eq_dataset) if (cfg.stack and eq_dataset is not None and len(eq_dataset)) else None
        self.noise = (
            RawBatchSource(noise_dataset)
            if (cfg.stack and noise_dataset is not None and len(noise_dataset))
            else None
        )
        # device-resident mode: trace pools live in HBM (uploaded once) and
        # windows are cropped on device (device_gather_crop); only index/
        # offset vectors cross the host->device link per step. Auto-on when
        # every active source is preloaded and the pools fit the budget.
        self._device_auto = device_data is None
        self._device_pool_budget = device_pool_budget
        if device_data is None:
            srcs = [s for s in (self.primary, self.eq, self.noise) if s is not None]
            device_data = (
                host_window
                and all(s.preloaded for s in srcs)
                and 0 < sum(s.pool_bytes for s in srcs) <= device_pool_budget
            )
        self.device_data = bool(device_data)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        # a dataset smaller than one batch would otherwise yield ZERO steps
        # per epoch: training silently does nothing (train_loss = mean over
        # no steps = nan, warmup/schedule frozen) — pad a single batch instead
        if drop_last and len(self.primary) < batch_size:
            drop_last = False
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.primary)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def epoch(self) -> Iterator[Dict]:
        import jax

        n = len(self.primary)
        order = self.rng.permutation(n)
        steps = len(self)
        stack_on = self.cfg.stack and self.eq is not None
        # device-resident crops need every active source preloaded; sources
        # may be swapped after construction (e.g. forced-lazy HDF5 reads), so
        # re-derive the effective mode each epoch instead of trusting the
        # __init__-time auto decision. Auto mode degrades to the host path
        # (and re-checks the pool budget against the current sources); an
        # EXPLICIT device_data=True fails loudly rather than silently
        # measuring the wrong path.
        srcs = [s for s in (self.primary, self.eq, self.noise) if s is not None]
        if self._device_auto:
            device_on = (
                self.device_data
                and all(s.preloaded for s in srcs)
                and sum(s.pool_bytes for s in srcs) <= self._device_pool_budget
            )
        else:
            device_on = self.device_data
            if device_on and not all(s.preloaded for s in srcs):
                raise RuntimeError(
                    "device_data=True requires every active source preloaded; "
                    "a lazy source was provided or swapped in after construction"
                )
        dev_cfg = (
            dataclasses.replace(self.cfg, pre_windowed=True)
            if (self.host_window or device_on)
            else self.cfg
        )

        sec_cfg = self.cfg.for_secondary()

        def pad_idx(idx):
            if len(idx) < self.batch_size:  # final partial batch (drop_last=False)
                reps = math.ceil(self.batch_size / len(idx))
                idx = np.concatenate([idx] * reps)[: self.batch_size]
            return idx

        def crop_on_device(src: RawBatchSource, meta: Dict, cfgx: AugmentConfig) -> Dict:
            off = select_window_offsets_host(self.rng, meta["len"], meta["p"], meta["s"], cfgx)
            x = device_gather_crop(
                src.device_pool(),
                meta["idx"],
                off.astype(np.int32),
                meta["len"].astype(np.int32),
                cfgx.window,
            )
            return {
                "x": x,
                "len": np.full(len(off), cfgx.window, dtype=np.int32),
                "p": (meta["p"] - off).astype(np.float32),
                "s": (meta["s"] - off).astype(np.float32),
                "is_lp": meta["is_lp"],
            }

        def make_device(i):
            # identical numpy-RNG draw order to the host path (batch indices
            # for all sources, then window offsets prim/sec/sec2/noi/noi2),
            # so both modes realize the same training stream from one seed
            idx = pad_idx(order[i * self.batch_size : (i + 1) * self.batch_size])
            prim_meta = self.primary.take_meta(idx)
            if stack_on:
                noise_src = self.noise or self.eq
                sec_meta = self.eq.take_meta(self.rng.integers(0, len(self.eq), size=self.batch_size))
                sec2_meta = self.eq.take_meta(self.rng.integers(0, len(self.eq), size=self.batch_size))
                noi_meta = noise_src.take_meta(self.rng.integers(0, len(noise_src), size=self.batch_size))
                noi2_meta = noise_src.take_meta(self.rng.integers(0, len(noise_src), size=self.batch_size))
            prim = crop_on_device(self.primary, prim_meta, self.cfg)
            if stack_on:
                sec = crop_on_device(self.eq, sec_meta, sec_cfg)
                sec2 = crop_on_device(self.eq, sec2_meta, sec_cfg)
                noi = crop_on_device(noise_src, noi_meta, self.cfg)
                noi2 = crop_on_device(noise_src, noi2_meta, self.cfg)
            else:
                sec = sec2 = noi = noi2 = None
            self.key, sub = jax.random.split(self.key)
            return augment_train_batch(sub, prim, sec, sec2, noi, noi2, dev_cfg)

        def make(i):
            if device_on:
                return make_device(i)
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            prim = self.primary.take(idx)
            if len(idx) < self.batch_size:  # final partial batch (drop_last=False)
                reps = math.ceil(self.batch_size / len(idx))
                prim = {
                    k: np.concatenate([v] * reps)[: self.batch_size] for k, v in prim.items()
                }
            if stack_on:
                sec = self.eq.random_batch(self.rng, self.batch_size)
                sec2 = self.eq.random_batch(self.rng, self.batch_size)
                noi = (self.noise or self.eq).random_batch(self.rng, self.batch_size)
                noi2 = (self.noise or self.eq).random_batch(self.rng, self.batch_size)
            else:
                sec = sec2 = noi = noi2 = None
            if self.host_window:
                prim = host_window_crop(self.rng, prim, self.cfg)
                if stack_on:
                    sec = host_window_crop(self.rng, sec, sec_cfg)
                    sec2 = host_window_crop(self.rng, sec2, sec_cfg)
                    noi = host_window_crop(self.rng, noi, self.cfg)
                    noi2 = host_window_crop(self.rng, noi2, self.cfg)
            self.key, sub = jax.random.split(self.key)
            return augment_train_batch(sub, prim, sec, sec2, noi, noi2, dev_cfg)

        # software pipeline: a producer thread assembles host batches (HDF5
        # reads in lazy mode) and dispatches the on-device augmentation; jax
        # dispatch is async, so the consumer overlaps with both
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        err = []
        stop = threading.Event()

        def producer():
            try:
                for i in range(steps):
                    if stop.is_set():
                        break
                    q.put(make(i))
            except Exception as e:  # surface worker failures to the consumer
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            # consumer may abandon the epoch early (break / GeneratorExit):
            # tell the producer to stop and drain its queue so it is never
            # left blocked inside a jax dispatch at interpreter teardown
            # (daemon threads killed mid-dispatch abort the process)
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
        if err:
            raise err[0]


def steered_frames(x, w0, window: int, detrend: bool = False, norm: str = "peak"):
    """Device-side steered framing + conditioning (pure JAX).

    x: (B, C, L) raw zero-padded trace buffers; w0: (B,) window starts
    (already clipped into the trace, SteeredWindow strategy="pad" semantics —
    `steered_window_offsets` computes them). Returns conditioned (B, C,
    window) frames. Call INSIDE the eval forward jit so framing, demean/
    detrend, per-channel normalization and the model forward fuse into one
    XLA program — this replaces the per-trace numpy loop of `eval_batch`
    (the reference's SteeredWindow + Normalize CPU augmentations,
    `volpick/model/models.py:445-452`) on the hot path.
    """
    import jax
    import jax.numpy as jnp

    from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude

    b, c, l = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (window, window)))

    def one(a, s):
        return jax.lax.dynamic_slice(a, (0, s + window), (c, window))

    frames = jax.vmap(one)(xp, w0.astype(jnp.int32))
    frames = detrend_linear(frames) if detrend else demean(frames)
    return normalize_amplitude(frames, norm=norm, per_channel=True)


def steered_window_offsets(
    lens: np.ndarray, start_samples: np.ndarray, end_samples: np.ndarray, window: int
):
    """Vectorized SteeredWindow placement over a batch of traces.

    Same math as `ops.windows.steered_window_indices` but with per-trace
    lengths: center the [start, end) region, clip the window into the trace,
    zero-pad when the trace is shorter than the window. Returns
    (w0 (B,), borders (B, 2))."""
    ss = np.asarray(start_samples, dtype=np.int64)
    es = np.asarray(end_samples, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    region = es - ss
    w0 = ss - (window - region) // 2
    w0 = np.clip(w0, 0, np.maximum(lens - window, 0))
    border_lo = ss - w0
    return w0, np.stack([border_lo, border_lo + region], axis=1)


def eval_batch(
    dataset,
    indices: Sequence[int],
    window: int,
    start_samples: Sequence[int],
    end_samples: Sequence[int],
    norm: str = "peak",
    detrend: bool = False,
):
    """Steered evaluation batch: fixed windows containing the target region.

    Returns (X (B, C, window) conditioned numpy array, window_borders (B, 2)).
    Mirrors SteeredWindow + Normalize eval augs (reference `models.py:445-452`).
    """
    from volpick_tpu.ops.windows import pad_frame, steered_window_indices

    xs, borders = [], []
    for idx, ss, es in zip(indices, start_samples, end_samples):
        data, md = dataset.get_sample(int(idx))
        n = data.shape[-1]
        w0, lo, hi = steered_window_indices(n, np.array([ss]), np.array([es]), window)
        xs.append(pad_frame(data, int(w0[0]), window))
        borders.append((int(lo[0]), int(hi[0])))
    x = np.stack(xs).astype(np.float32)
    # conditioning (demean/detrend + per-channel peak/std norm)
    if detrend:
        t = np.arange(window) - (window - 1) / 2
        slope = ((x - x.mean(-1, keepdims=True)) * t).sum(-1, keepdims=True) / (t * t).sum()
        x = x - x.mean(-1, keepdims=True) - slope * t
    else:
        x = x - x.mean(-1, keepdims=True)
    if norm == "peak":
        x = x / (np.abs(x).max(-1, keepdims=True) + 1e-10)
    else:
        x = x / (x.std(-1, keepdims=True) + 1e-10)
    return x, np.asarray(borders, dtype=np.int64)
