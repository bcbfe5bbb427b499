"""Convert a published ProteinMPNN PyTorch checkpoint to molchanica-tpu's
flat weight layout, and record a golden forward for verification.

Reference-parity analog of /root/reference/scripts/convert_mpnn_weights.py
(+ the `--verify-mpnn` replay in src/main.rs:78-112): the conversion
records the converted model's log-probabilities on a fixed synthetic
backbone into the output file; `--verify` replays them through the JAX
forward pass and enforces max-abs-diff < 1e-3.

Usage (requires a downloaded upstream checkpoint, e.g. vanilla
v_48_020.pt from github.com/dauparas/ProteinMPNN — not shipped in this
image, which has no network access):

    python scripts/convert_mpnn_weights.py v_48_020.pt out/mpnn_weights.npz
    python scripts/convert_mpnn_weights.py --verify out/mpnn_weights.npz
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

GOLDEN_L = 24
TOL = 1e-3

# upstream state_dict name -> our flat name (PyTorch [out, in] kept as-is)
TOP_MAP = {
    "features.embeddings.linear.weight": "positional.weight",
    "features.embeddings.linear.bias": "positional.bias",
    "features.edge_embedding.weight": "edge_embedding.weight",
    "features.edge_embedding.bias": "edge_embedding.bias",
    "features.norm_edges.weight": "norm_edges.weight",
    "features.norm_edges.bias": "norm_edges.bias",
    "W_e.weight": "w_e.weight",
    "W_e.bias": "w_e.bias",
    "W_s.weight": "w_s.weight",
    "W_out.weight": "w_out.weight",
    "W_out.bias": "w_out.bias",
}


def _layer_map(kind: str, i: int) -> dict:
    """Per-layer name map: upstream {Enc,Dec}Layer -> our encoder{i}./
    decoder{i}. flat names."""
    pre_u = f"{kind}_layers.{i}."
    pre_o = f"{'encoder' if kind == 'encoder' else 'decoder'}{i}."
    m = {}
    for w in ("W1", "W2", "W3"):
        for p in ("weight", "bias"):
            m[f"{pre_u}{w}.{p}"] = f"{pre_o}{w.lower()}.{p}"
    for nrm in ("norm1", "norm2"):
        for p in ("weight", "bias"):
            m[f"{pre_u}{nrm}.{p}"] = f"{pre_o}{nrm}.{p}"
    for p in ("weight", "bias"):
        m[f"{pre_u}dense.W_in.{p}"] = f"{pre_o}dense_in.{p}"
        m[f"{pre_u}dense.W_out.{p}"] = f"{pre_o}dense_out.{p}"
    if kind == "encoder":
        for w in ("W11", "W12", "W13"):
            for p in ("weight", "bias"):
                m[f"{pre_u}{w}.{p}"] = f"{pre_o}{w.lower()}.{p}"
        for p in ("weight", "bias"):
            m[f"{pre_u}norm3.{p}"] = f"{pre_o}norm3.{p}"
    return m


def golden_backbone():
    """Fixed synthetic alpha-helix-like backbone (deterministic; matches the
    reference's record-on-synthetic-backbone pattern)."""
    from molchanica_tpu.therapeutic.mpnn import Backbone

    L = GOLDEN_L
    t = np.arange(L, dtype=np.float64)
    ca = np.stack([2.3 * np.cos(t * 1.75), 2.3 * np.sin(t * 1.75),
                   1.5 * t], axis=-1)
    n = ca + np.array([-1.2, 0.3, -0.5])
    c = ca + np.array([1.1, -0.4, 0.6])
    o = c + np.array([0.3, 1.1, 0.2])
    return Backbone(n=n.astype(np.float32), ca=ca.astype(np.float32),
                    c=c.astype(np.float32), o=o.astype(np.float32),
                    chain_index=np.zeros(L, np.int32),
                    residue_index=np.arange(L, dtype=np.int32))


def convert(src: str, dst: str) -> None:
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    name_map = dict(TOP_MAP)
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("encoder_layers."))
    assert n_layers == 3, \
        f"expected the 3-layer published model, got {n_layers}"
    for i in range(3):
        name_map.update(_layer_map("encoder", i))
        name_map.update(_layer_map("decoder", i))

    out = {}
    for uname, oname in name_map.items():
        if uname not in sd:
            raise KeyError(f"checkpoint missing {uname}")
        out[oname] = np.asarray(sd[uname].detach().numpy(), np.float32)
    unused = set(sd) - set(name_map)
    if unused:
        print(f"note: {len(unused)} upstream tensors unused "
              f"(e.g. {sorted(unused)[:3]})")

    # record the golden replay through OUR forward (verify replays it)
    import jax

    from molchanica_tpu.therapeutic import mpnn

    params = {k: np.asarray(v) for k, v in out.items()}
    lp = np.asarray(mpnn.forward(
        {k: mpnn.jnp.asarray(v) for k, v in params.items()},
        golden_backbone()))
    out["__golden_log_probs__"] = lp
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out) - 1} tensors + golden "
          f"[{lp.shape[0]}, {lp.shape[1]}]")


def verify(path: str) -> None:
    from molchanica_tpu.therapeutic import mpnn

    d = dict(np.load(path))
    golden = d.pop("__golden_log_probs__")
    lp = np.asarray(mpnn.forward(
        {k: mpnn.jnp.asarray(v) for k, v in d.items()}, golden_backbone()))
    diff = float(np.abs(lp - golden).max())
    ok = diff < TOL
    print(f"verify-mpnn: max-abs-diff {diff:.2e} "
          f"({'OK' if ok else 'FAIL'}, tol {TOL})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--verify":
        verify(args[1])
    elif len(args) == 2:
        convert(args[0], args[1])
    else:
        print(__doc__)
        sys.exit(2)
