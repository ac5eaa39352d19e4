"""EQTransformer (Mousavi et al. 2020) in functional JAX.

Architecture pinned by the shipped volpick weights
(`/root/reference/Final_models/volpick/eqtransformer/volpick.pt.v1`, SURVEY §2.5):

- shared encoder: 7 convs (3→8→16→16→32→32→64→64, k 11/9/7/7/5/5/3), each
  followed by max-pool 2 (6000 → 47 samples; pool 4 pads 1 on 375-length maps);
- 7 pre-activation residual CNN blocks (BN eps 1e-3 → relu → conv, kernels
  3/3/3/3/2/3/2; even kernels pad (0,1) right — keras asymmetric 'same');
- 3 BiLSTM blocks (hidden 16; 1×1 conv 32→16 + BN after each);
- 2 additive-attention transformer blocks (residual + keras LayerNorm with
  (16,1) γ/β over channels, FF 16→128→16);
- detection branch: 7-conv upsampling decoder (16→…→8, kernels mirrored) +
  sigmoid 1×1×11 conv;
- two pick branches (P, S): LSTM(16→16) + width-3 additive attention +
  decoder + sigmoid conv.

Forward returns (detection, P, S), each (B, 6000). ZNE, norm 'peak' for the
volpick weights.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volpick_tpu.models.layers import (
    batch_norm,
    bilstm,
    conv1d,
    conv1d_same,
    dropout,
    layer_norm_keras,
    lstm,
    lstm_multi,
    max_pool1d,
    seq_self_attention,
    seq_self_attention_banded,
    spatial_dropout1d,
    upsample2_conv1d_same,
    upsample_nearest,
)

_BN_EPS = 1e-3
_LN_EPS = 1e-14
_ATTN_EPS = 1e-5


def _encoder_pool_paddings(in_samples: int, n_layers: int) -> List[int]:
    """Per-layer max-pool paddings: odd-length maps pad by 1 (keras 'same' pooling)."""
    pads = []
    cur = in_samples
    for _ in range(n_layers):
        p = cur % 2
        pads.append(p)
        cur = (cur + p) // 2
    return pads


def _decoder_crops(out_samples: int, n_layers: int) -> List[int]:
    """Decoder layers (by index) that must drop one trailing sample after 2× upsampling."""
    crops = []
    cur = out_samples
    for i in range(n_layers):
        p = cur % 2
        cur = (cur + p) // 2
        if p == 1:
            crops.append(n_layers - 1 - i)
    return crops


def _block_diag_kernel(ws) -> jnp.ndarray:
    """Stack per-branch conv kernels (O, I, K) into ONE dense block-diagonal
    kernel (G·O, G·I, K): branch g's filters see only channels [g·I, (g+1)·I).
    Equivalent to feature_group_count=G but lowered as a plain dense conv —
    at G·I ≤ 64 input channels the dense conv occupies the same single padded
    128-lane MXU tile, so the structural zeros are free."""
    o, i, k = ws[0].shape
    g = len(ws)
    w = jnp.zeros((g * o, g * i, k), ws[0].dtype)
    for j, wj in enumerate(ws):
        w = w.at[j * o:(j + 1) * o, j * i:(j + 1) * i].set(wj)
    return w


@dataclasses.dataclass
class EQTransformer:
    in_channels: int = 3
    in_samples: int = 6000
    classes: int = 2
    phases: str = "PS"
    norm: str = "peak"
    sampling_rate: float = 100.0
    lstm_blocks: int = 3
    drop_rate: float = 0.1
    component_order: str = "ZNE"
    default_args: dict = dataclasses.field(default_factory=dict)
    name: str = "EQTransformer"

    filters: Tuple[int, ...] = (8, 16, 16, 32, 32, 64, 64)
    kernel_sizes: Tuple[int, ...] = (11, 9, 7, 7, 5, 5, 3)
    res_cnn_kernels: Tuple[int, ...] = (3, 3, 3, 3, 2, 3, 2)

    @property
    def labels(self) -> str:
        return "D" + self.phases  # detection + phases

    @property
    def detection_branches(self) -> Tuple[Tuple[str, str], ...]:
        """(decoder param key, output conv param key) per detection head."""
        return (("decoder_d", "conv_d"),)

    # ---- parameters ----------------------------------------------------------
    def init(self, key: jax.Array) -> Dict:
        keys = iter(jax.random.split(key, 256))

        def conv(o, i, k):
            bound = float(np.sqrt(6.0 / (i * k)))
            return {
                "w": jax.random.uniform(next(keys), (o, i, k), jnp.float32, -bound, bound),
                "b": jnp.zeros((o,), jnp.float32),
            }

        def bn(c):
            return {
                "scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
                "mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32),
            }

        def lstm_p(inp, hid, bidirectional=False):
            def mat(r, c):
                bound = float(np.sqrt(1.0 / hid))
                return jax.random.uniform(next(keys), (r, c), jnp.float32, -bound, bound)

            p = {
                "w_ih": mat(4 * hid, inp),
                "w_hh": mat(4 * hid, hid),
                "b_ih": jnp.zeros((4 * hid,), jnp.float32),
                "b_hh": jnp.zeros((4 * hid,), jnp.float32),
            }
            if bidirectional:
                p.update(
                    w_ih_rev=mat(4 * hid, inp),
                    w_hh_rev=mat(4 * hid, hid),
                    b_ih_rev=jnp.zeros((4 * hid,), jnp.float32),
                    b_hh_rev=jnp.zeros((4 * hid,), jnp.float32),
                )
            return p

        def attention(c, units=32):
            u = 0.02
            return {
                "Wx": jax.random.uniform(next(keys), (c, units), jnp.float32, -u, u),
                "Wt": jax.random.uniform(next(keys), (c, units), jnp.float32, -u, u),
                "bh": jnp.zeros((units,), jnp.float32),
                "Wa": jax.random.uniform(next(keys), (units, 1), jnp.float32, -u, u),
                "ba": jnp.zeros((1,), jnp.float32),
            }

        def transformer(c, ff_hidden=128):
            return {
                "attention": attention(c),
                "norm1": {"gamma": jnp.ones((c, 1), jnp.float32), "beta": jnp.zeros((c, 1), jnp.float32)},
                "ff": {
                    "lin1": {
                        "w": jax.random.uniform(next(keys), (ff_hidden, c), jnp.float32, -0.05, 0.05),
                        "b": jnp.zeros((ff_hidden,), jnp.float32),
                    },
                    "lin2": {
                        "w": jax.random.uniform(next(keys), (c, ff_hidden), jnp.float32, -0.05, 0.05),
                        "b": jnp.zeros((c,), jnp.float32),
                    },
                },
                "norm2": {"gamma": jnp.ones((c, 1), jnp.float32), "beta": jnp.zeros((c, 1), jnp.float32)},
            }

        def decoder():
            filters = list(self.filters[::-1])
            ks = list(self.kernel_sizes[::-1])
            ins = [16] + filters[:-1]
            return [conv(o, i, k) for i, o, k in zip(ins, filters, ks)]

        enc_ins = [self.in_channels] + list(self.filters[:-1])
        params: Dict = {
            "encoder": [conv(o, i, k) for i, o, k in zip(enc_ins, self.filters, self.kernel_sizes)],
            "res_cnn": [
                {
                    "norm1": bn(self.filters[-1]),
                    "conv1": conv(self.filters[-1], self.filters[-1], k),
                    "norm2": bn(self.filters[-1]),
                    "conv2": conv(self.filters[-1], self.filters[-1], k),
                }
                for k in self.res_cnn_kernels
            ],
            "bilstm": [
                {
                    "lstm": lstm_p(self.filters[-1] if i == 0 else 16, 16, bidirectional=True),
                    "conv": conv(16, 32, 1),
                    "norm": bn(16),
                }
                for i in range(self.lstm_blocks)
            ],
            "transformer_d0": transformer(16),
            "transformer_d": transformer(16),
            "decoder_d": decoder(),
            "conv_d": conv(1, self.filters[0], 11),
            "pick_lstms": [lstm_p(16, 16) for _ in self.phases],
            "pick_attentions": [attention(16) for _ in self.phases],
            "pick_decoders": [decoder() for _ in self.phases],
            "pick_convs": [conv(1, self.filters[0], 11) for _ in self.phases],
        }
        return params

    # ---- forward --------------------------------------------------------------
    def apply(
        self,
        params: Dict,
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        logits: bool = False,
        fused: Optional[bool] = None,
        stop_after: Optional[str] = None,
    ):
        """x: (B, 3, 6000) → (detection, P, S) each (B, 6000).

        In train mode returns ((det, p, s), bn_updates); `rng` drives dropout.

        `fused` (default: eval mode only) routes inference through the
        scan/conv-merged program: each BiLSTM's two directions and the P/S
        pick LSTMs ride single lstm_multi scans (8 sequential 47-step scans →
        4), and the det/P/S upsampling decoders + output convs run as ONE
        merged conv stack — mathematically the same branches, 1/3 the conv
        launches. Train mode keeps the per-branch program (per-branch
        dropout masks). See the flag parsing below for the measurable
        sub-variants ("lstm", "grouped", "blockdiag").

        `stop_after` (probe/diagnostic, eval-only) truncates the program
        after the named stage and returns that stage's live intermediate —
        "encoder" | "res_cnn" | "bilstm" | "transformer" (the trunk (B,16,T))
        or "pick" (the tuple of per-branch decoder inputs). Timing these
        prefixes with successive differencing splits the forward's wall time
        by stage (scripts/tpu_probe.py --forward-stages); returning the raw
        intermediate keeps the whole prefix live against XLA DCE.
        """
        _STAGES = ("encoder", "res_cnn", "bilstm", "transformer", "pick")
        if stop_after is not None and stop_after not in _STAGES:
            raise ValueError(f"stop_after must be one of {_STAGES}")
        if stop_after is not None and train:
            raise ValueError("stop_after is inference-only")
        if fused is None:
            # Eval-mode default: "plstm+bandattn", from the quiet-chip
            # "fused_forward" sweep (docs/TPU_PROBE.jsonl, r4): per-branch
            # 149.6k windows/s at batch 256 fp32; plstm+bandattn 164.8k
            # (+10.2%) — the Pallas merged-recurrence kernel plus the banded
            # pick attention. The per-stage split ("forward_stages") shows
            # the decoders own 0.99 of the 1.68 ms and sit at the HBM/
            # small-channel wall: every decoder-merging transform measured
            # SLOWER (grouped 107.9k / blockdiag 100.5k / polyphase 124.7k),
            # so decode stays per-branch. The transformer blocks' dense
            # additive attention is VPU-tanh-bound (B·T²·U ≈ 36M tanh per
            # batch-256 call ≈ its whole 0.32 ms stage cost); the "pattn"
            # VMEM kernel measured SLOWER too (plstm+bandattn+pattn 122.1k
            # vs 158.1k without, same sweep) — a kernel can lower launch and
            # HBM overheads but not the tanh count, and the XLA lowering
            # already hides the rest. Override per call or via
            # VOLPICK_EQT_FUSED=(0|1|lstm|plstm|grouped|blockdiag|bandattn|
            # polyup|…+…) if a future chip/workload ranks differently.
            env = os.environ.get("VOLPICK_EQT_FUSED", "").strip().lower()
            if env in ("0", "false", "off", "no"):
                fused = False
            elif env in ("", "1", "true", "on", "yes"):
                # Pallas kernels only where they compile natively; on CPU
                # (tests, interpret mode) the default stays pure-XLA
                best = ("plstm+bandattn" if jax.default_backend() == "tpu"
                        else "bandattn")
                fused = best if not train else False
            else:
                fused = env if not train else False
        if fused and train:
            raise ValueError("fused EQTransformer path is inference-only")
        # fused accepts False | True | a "+"-joined subset of {"lstm",
        # "grouped", "blockdiag"} so the two transforms can be measured
        # independently: "lstm" merges the LSTM scans; "grouped"/"blockdiag"
        # merge the decoders (feature_group_count conv vs one dense conv with
        # block-diagonal weights — on TPU both land in one padded MXU tile,
        # but they lower differently). True = "lstm+blockdiag".
        band_attn = poly_up = p_attn = False
        if fused is True:
            fused = "plstm+bandattn"  # the measured-best combo (see above)
        if not fused:
            fuse_lstm, decode_mode = False, "branch"
        else:
            parts = set(str(fused).split("+"))
            unknown = parts - {"lstm", "plstm", "grouped", "blockdiag",
                               "bandattn", "polyup", "pattn"}
            if unknown:
                raise ValueError(f"unknown fused flags: {sorted(unknown)}")
            # "plstm": the merged recurrences run as single Pallas kernels
            # (ops/pallas/lstm.py) instead of lax.scan — implies "lstm"
            fuse_lstm = "pallas" if "plstm" in parts else "lstm" in parts
            # "bandattn": pick-branch attention computes only its width-3
            # band (layers.seq_self_attention_banded) instead of the dense
            # masked T×T energies — O(eps) deviation, pinned by test
            band_attn = "bandattn" in parts
            # "polyup": decoder upsample+conv as polyphase convs at input
            # resolution (layers.upsample2_conv1d_same) — half the conv
            # FLOPs, no 2× intermediate in HBM; composes with grouped/
            # blockdiag merging
            poly_up = "polyup" in parts
            # "pattn": the transformer blocks' dense additive attention as
            # a VMEM Pallas kernel (ops/pallas/addattn.py)
            p_attn = "pattn" in parts
            decode_mode = (
                "grouped" if "grouped" in parts
                else "blockdiag" if "blockdiag" in parts
                else "branch"
            )
        updates: Dict = {}
        rngs = iter(jax.random.split(rng, 64)) if rng is not None else iter([])

        def next_rng():
            try:
                return next(rngs)
            except StopIteration:
                return None

        def bn(h, p, path):
            y, u = batch_norm(h, p, train=train, eps=_BN_EPS)
            if u is not None:
                updates[path] = u
            return y

        act = jax.nn.relu
        pool_pads = _encoder_pool_paddings(self.in_samples, len(self.filters))

        # --- shared encoder
        h = x
        for conv_p, pad in zip(params["encoder"], pool_pads):
            h = act(conv1d_same(h, conv_p["w"], conv_p["b"]))
            h = max_pool1d(h, 2, padding=pad)
        if stop_after == "encoder":
            return h

        # --- residual CNN stack (pre-activation)
        for j, block in enumerate(params["res_cnn"]):
            k = block["conv1"]["w"].shape[-1]
            y = act(bn(h, block["norm1"], f"res_cnn.{j}.norm1"))
            y = spatial_dropout1d(y, self.drop_rate, next_rng(), train)
            y = conv1d_same(y, block["conv1"]["w"], block["conv1"]["b"])
            y = act(bn(y, block["norm2"], f"res_cnn.{j}.norm2"))
            y = spatial_dropout1d(y, self.drop_rate, next_rng(), train)
            y = conv1d_same(y, block["conv2"]["w"], block["conv2"]["b"])
            h = h + y
        if stop_after == "res_cnn":
            return h

        # --- BiLSTM stack
        for j, block in enumerate(params["bilstm"]):
            y = bilstm(h, block["lstm"], fused=fuse_lstm)
            y = dropout(y, self.drop_rate, next_rng(), train)
            y = conv1d(y, block["conv"]["w"], block["conv"]["b"])
            h = bn(y, block["norm"], f"bilstm.{j}.norm")
        if stop_after == "bilstm":
            return h

        # --- transformer blocks
        def transformer_block(h, p, path):
            if p_attn:
                from volpick_tpu.ops.pallas.addattn import seq_self_attention_pallas

                y = seq_self_attention_pallas(
                    h, p["attention"], eps=_ATTN_EPS,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                y, _ = seq_self_attention(h, p["attention"], eps=_ATTN_EPS)
            y = h + y
            y = layer_norm_keras(y, p["norm1"]["gamma"], p["norm1"]["beta"], _LN_EPS)
            ht = y.transpose(0, 2, 1)
            f = act(ht @ p["ff"]["lin1"]["w"].T + p["ff"]["lin1"]["b"])
            f = dropout(f, self.drop_rate, next_rng(), train)
            f = f @ p["ff"]["lin2"]["w"].T + p["ff"]["lin2"]["b"]
            y2 = y + f.transpose(0, 2, 1)
            return layer_norm_keras(y2, p["norm2"]["gamma"], p["norm2"]["beta"], _LN_EPS)

        h = transformer_block(h, params["transformer_d0"], "transformer_d0")
        h = transformer_block(h, params["transformer_d"], "transformer_d")
        if stop_after == "transformer":
            return h

        # --- decoders
        crops = set(_decoder_crops(self.in_samples, len(self.filters)))

        def decode(h, convs):
            for i, conv_p in enumerate(convs):
                if poly_up:
                    h = act(upsample2_conv1d_same(
                        h, conv_p["w"], conv_p["b"], crop_last=i in crops))
                    continue
                h = upsample_nearest(h, 2)
                if i in crops:
                    h = h[..., :-1]
                h = act(conv1d_same(h, conv_p["w"], conv_p["b"]))
            return h

        # --- per-branch inputs at bottleneck resolution: detection branches
        # take the trunk output; pick branches run LSTM + local attention
        # first (merged into one lstm_multi scan when fuse_lstm)
        n_phase = len(params["pick_lstms"])
        branch_ins = [h for _ in self.detection_branches]
        if fuse_lstm and n_phase:
            xs = jnp.broadcast_to(h[None], (n_phase,) + h.shape)
            w_ih = jnp.stack([lp["w_ih"] for lp in params["pick_lstms"]])
            w_hh = jnp.stack([lp["w_hh"] for lp in params["pick_lstms"]])
            bias = jnp.stack([lp["b_ih"] + lp["b_hh"] for lp in params["pick_lstms"]])
            if fuse_lstm == "pallas":
                from volpick_tpu.ops.pallas.lstm import lstm_multi_pallas

                px = lstm_multi_pallas(
                    xs, w_ih, w_hh, bias,
                    interpret=jax.default_backend() != "tpu",
                )  # (n_phase, B, 16, T)
            else:
                px = lstm_multi(xs, w_ih, w_hh, bias)  # (n_phase, B, 16, T)
            attn_p = jax.tree.map(lambda *a: jnp.stack(a), *params["pick_attentions"])
            if band_attn:
                px = jax.vmap(
                    lambda xb, pb: seq_self_attention_banded(xb, pb, 3, eps=_ATTN_EPS)
                )(px, attn_p)
            else:
                px = jax.vmap(
                    lambda xb, pb: seq_self_attention(xb, pb, attention_width=3, eps=_ATTN_EPS)[0]
                )(px, attn_p)
            branch_ins.extend(px[i] for i in range(n_phase))
        else:
            for lp, ap in zip(params["pick_lstms"], params["pick_attentions"]):
                px = lstm(h, lp["w_ih"], lp["w_hh"], lp["b_ih"], lp["b_hh"])
                px = dropout(px, self.drop_rate, next_rng(), train)
                if band_attn:
                    px = seq_self_attention_banded(px, ap, 3, eps=_ATTN_EPS)
                else:
                    px, _ = seq_self_attention(px, ap, attention_width=3, eps=_ATTN_EPS)
                branch_ins.append(px)
        if stop_after == "pick":
            return tuple(branch_ins)

        dec_lists = [params[dk] for dk, _ in self.detection_branches]
        dec_lists += list(params["pick_decoders"])
        out_convs = [params[ck] for _, ck in self.detection_branches]
        out_convs += list(params["pick_convs"])

        if decode_mode == "branch":
            outputs = []
            for z, dp, cp in zip(branch_ins, dec_lists, out_convs):
                z = decode(z, dp)
                pred = conv1d_same(z, cp["w"], cp["b"])[:, 0]
                if not logits:
                    pred = jax.nn.sigmoid(pred)
                outputs.append(pred)
            out = tuple(outputs)
        else:
            # ONE decode for every branch: grouped (feature_group_count) or
            # one dense conv with block-diagonal weights. At these channel
            # counts (G×16 ≤ 64) both land in a single padded MXU tile, so
            # the block-diagonal "extra" FLOPs cost nothing — what differs is
            # how XLA lowers them.
            groups = len(dec_lists)
            z = jnp.concatenate(branch_ins, axis=1)  # (B, groups*16, T)

            def merged(ws, bs):
                b_g = jnp.concatenate(bs, axis=0)
                if decode_mode == "grouped":
                    return jnp.concatenate(ws, axis=0), b_g, groups
                return _block_diag_kernel(ws), b_g, 1

            for i in range(len(dec_lists[0])):
                w_g, b_g, g = merged([d[i]["w"] for d in dec_lists],
                                     [d[i]["b"] for d in dec_lists])
                if poly_up:
                    z = act(upsample2_conv1d_same(
                        z, w_g, b_g, crop_last=i in crops, groups=g))
                    continue
                z = upsample_nearest(z, 2)
                if i in crops:
                    z = z[..., :-1]
                z = act(conv1d_same(z, w_g, b_g, groups=g))
            w_o, b_o, g = merged([c["w"] for c in out_convs],
                                 [c["b"] for c in out_convs])
            preds = conv1d_same(z, w_o, b_o, groups=g)  # (B, groups, W)
            if not logits:
                preds = jax.nn.sigmoid(preds)
            out = tuple(preds[:, i] for i in range(groups))

        if train:
            return out, updates
        return out

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)


@dataclasses.dataclass
class VolEQTransformer(EQTransformer):
    """4-head EQTransformer separating LP vs regular-event detection.

    Functional realization of the reference's abandoned VolEQTransformerLit
    design (commented out at `volpick/model/models.py:909-1557`): the shared
    encoder / res-CNN / BiLSTM / transformer trunk feeds TWO detection
    decoder branches — regular (VT) events and long-period events — plus the
    usual P/S pick branches. apply() returns
    ``(rg_detection, lp_detection, P, S)`` matching the commented
    shared_step's unpacking (`models.py:963-976`). Detection labels are
    gated per trace by source type (EventTypeDetectionLabeller semantics,
    `models.py:1376-1456`: "if the source type of the input is not the
    specified one, labels are zeros") — see Trainer._loss.
    """

    name: str = "VolEQTransformer"

    @property
    def detection_branches(self) -> Tuple[Tuple[str, str], ...]:
        return (("decoder_d", "conv_d"), ("decoder_lp", "conv_lp"))

    def init(self, key: jax.Array) -> Dict:
        k1, k2 = jax.random.split(key)
        params = EQTransformer.init(self, k1)
        donor = EQTransformer.init(self, k2)  # independent weights for head 2
        params["decoder_lp"] = donor["decoder_d"]
        params["conv_lp"] = donor["conv_d"]
        return params
