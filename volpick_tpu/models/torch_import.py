"""Torch state-dict → JAX param-tree importer for the published volpick weights.

Loads `volpick.pt.v1` checkpoints (reference
`Final_models/volpick/{phasenet,eqtransformer}/`) and remaps them into the
functional param trees of volpick_tpu.models. Layout transforms:

- forward Conv1d weights (O, I, K): copied as-is (our conv uses OIH kernels);
- ConvTranspose1d weights (I, O, K): transposed to (O, I, K) and spatially
  flipped once here, so the forward pass can use a plain input-dilated conv;
- BatchNorm weight/bias/running_mean/running_var → scale/bias/mean/var;
- LSTM weights keep torch's fused (i, f, g, o) gate layout.

torch is used only to deserialize the checkpoint (host-side, lazy import);
nothing at runtime depends on it.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"w": sd[f"{prefix}.weight"]}
    if bias:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _lstm(sd: Dict[str, np.ndarray], prefix: str, bidirectional: bool = False) -> Dict[str, np.ndarray]:
    p = {
        "w_ih": sd[f"{prefix}.weight_ih_l0"],
        "w_hh": sd[f"{prefix}.weight_hh_l0"],
        "b_ih": sd[f"{prefix}.bias_ih_l0"],
        "b_hh": sd[f"{prefix}.bias_hh_l0"],
    }
    if bidirectional:
        p.update(
            w_ih_rev=sd[f"{prefix}.weight_ih_l0_reverse"],
            w_hh_rev=sd[f"{prefix}.weight_hh_l0_reverse"],
            b_ih_rev=sd[f"{prefix}.bias_ih_l0_reverse"],
            b_hh_rev=sd[f"{prefix}.bias_hh_l0_reverse"],
        )
    return p


def _attention(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k: sd[f"{prefix}.{k}"] for k in ("Wx", "Wt", "bh", "Wa", "ba")}


def import_phasenet(path: str, depth: int = 5) -> Dict:
    sd = _load_torch_state_dict(path)
    params: Dict = {
        "inc": _conv(sd, "inc"),
        "in_bn": _bn(sd, "in_bn"),
        "down": [],
        "up": [],
        "out": _conv(sd, "out"),
    }
    for i in range(depth):
        stage = {
            "conv_same": _conv(sd, f"down_branch.{i}.0", bias=False),
            "bn1": _bn(sd, f"down_branch.{i}.1"),
        }
        if f"down_branch.{i}.2.weight" in sd:
            stage["conv_down"] = _conv(sd, f"down_branch.{i}.2", bias=False)
            stage["bn2"] = _bn(sd, f"down_branch.{i}.3")
        params["down"].append(stage)
    for i in range(depth - 1):
        w_t = sd[f"up_branch.{i}.0.weight"]  # (I, O, K) torch ConvTranspose layout
        stage = {
            "conv_up": {"w": np.ascontiguousarray(w_t.transpose(1, 0, 2)[:, :, ::-1])},
            "bn1": _bn(sd, f"up_branch.{i}.1"),
            "conv_same": _conv(sd, f"up_branch.{i}.2", bias=False),
            "bn2": _bn(sd, f"up_branch.{i}.3"),
        }
        params["up"].append(stage)
    return params


def import_eqtransformer(path: str, n_encoder: int = 7, n_res: int = 7, n_lstm: int = 3, n_phases: int = 2) -> Dict:
    sd = _load_torch_state_dict(path)

    def decoder(prefix: str):
        return [_conv(sd, f"{prefix}.convs.{i}") for i in range(n_encoder)]

    def transformer(prefix: str):
        return {
            "attention": _attention(sd, f"{prefix}.attention"),
            "norm1": {"gamma": sd[f"{prefix}.norm1.gamma"], "beta": sd[f"{prefix}.norm1.beta"]},
            "ff": {
                "lin1": {"w": sd[f"{prefix}.ff.lin1.weight"], "b": sd[f"{prefix}.ff.lin1.bias"]},
                "lin2": {"w": sd[f"{prefix}.ff.lin2.weight"], "b": sd[f"{prefix}.ff.lin2.bias"]},
            },
            "norm2": {"gamma": sd[f"{prefix}.norm2.gamma"], "beta": sd[f"{prefix}.norm2.beta"]},
        }

    params: Dict = {
        "encoder": [_conv(sd, f"encoder.convs.{i}") for i in range(n_encoder)],
        "res_cnn": [
            {
                "norm1": _bn(sd, f"res_cnn_stack.members.{j}.norm1"),
                "conv1": _conv(sd, f"res_cnn_stack.members.{j}.conv1"),
                "norm2": _bn(sd, f"res_cnn_stack.members.{j}.norm2"),
                "conv2": _conv(sd, f"res_cnn_stack.members.{j}.conv2"),
            }
            for j in range(n_res)
        ],
        "bilstm": [
            {
                "lstm": _lstm(sd, f"bi_lstm_stack.members.{j}.lstm", bidirectional=True),
                "conv": _conv(sd, f"bi_lstm_stack.members.{j}.conv"),
                "norm": _bn(sd, f"bi_lstm_stack.members.{j}.norm"),
            }
            for j in range(n_lstm)
        ],
        "transformer_d0": transformer("transformer_d0"),
        "transformer_d": transformer("transformer_d"),
        "decoder_d": decoder("decoder_d"),
        "conv_d": _conv(sd, "conv_d"),
        "pick_lstms": [_lstm(sd, f"pick_lstms.{k}") for k in range(n_phases)],
        "pick_attentions": [_attention(sd, f"pick_attentions.{k}") for k in range(n_phases)],
        "pick_decoders": [decoder(f"pick_decoders.{k}") for k in range(n_phases)],
        "pick_convs": [_conv(sd, f"pick_convs.{k}") for k in range(n_phases)],
    }
    return params
