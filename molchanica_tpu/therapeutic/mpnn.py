"""ProteinMPNN unconditional-probability network in JAX (TPU-native).

Reference parity: the native Rust forward pass in
/root/reference/src/therapeutic/ddg/mpnn.rs:42-50 (HIDDEN=128, K=48,
16 RBF, 3 encoder + 3 decoder message-passing layers, `unconditional_probs`
with no sequence input) and the saturation ΔΔG scan in ddg/mod.rs:349.

Design: everything is one jitted program of [L, K, ·] batched matmuls —
the message MLPs map straight onto the MXU; neighbor gathers happen once
per forward (not per layer pair like a naive translation would).
Weights are a flat name->array pytree, shaped to accept converted
published ProteinMPNN checkpoints (PyTorch [out, in] Linear layout).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"
HIDDEN = 128
K_NEIGHBORS = 48
NUM_RBF = 16
NUM_ATOM_PAIRS = 25
MAX_RELATIVE = 32
POS_IN = 2 * MAX_RELATIVE + 2          # 66 one-hot buckets
POS_EMB = 16
MESSAGE_SCALE = 30.0
FF_HIDDEN = 4 * HIDDEN

# the 25 ordered (from, to) backbone atom pairs; order is part of the
# learned weight layout (atoms: 0=N 1=Ca 2=C 3=O 4=Cb)
ATOM_PAIRS = [
    (1, 1), (0, 0), (2, 2), (3, 3), (4, 4), (1, 0), (1, 2), (1, 3),
    (1, 4), (0, 2), (0, 3), (0, 4), (4, 2), (4, 3), (3, 2), (0, 1),
    (2, 1), (3, 1), (4, 1), (2, 0), (3, 0), (4, 0), (2, 4), (3, 4),
    (2, 3),
]


@dataclass
class Backbone:
    n: np.ndarray           # [L, 3]
    ca: np.ndarray
    c: np.ndarray
    o: np.ndarray
    chain_index: np.ndarray     # [L] int
    residue_index: np.ndarray   # [L] int

    def __len__(self):
        return self.n.shape[0]


def virtual_cb(n, ca, c):
    """Idealised Cb from backbone geometry (upstream's exact constants)."""
    b = ca - n
    cc = c - ca
    a = jnp.cross(b, cc)
    return -0.5827343 * a + 0.5680283 * b - 0.5406747 * cc + ca


def _rbf(d):
    """[... ] -> [..., NUM_RBF] gaussian radial basis on linspace(2,22,16)."""
    mu = jnp.linspace(2.0, 22.0, NUM_RBF)
    sigma = (22.0 - 2.0) / NUM_RBF
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))


def _gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _ln(p, prefix, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p[f"{prefix}.weight"] \
        + p[f"{prefix}.bias"]


def _lin(p, prefix, x):
    return x @ p[f"{prefix}.weight"].T + p[f"{prefix}.bias"]


def _message_mlp(p, prefix, x):
    h = _gelu(_lin(p, f"{prefix}1", x))
    h = _gelu(_lin(p, f"{prefix}2", h))
    return _lin(p, f"{prefix}3", h)


def knn_graph(ca, k):
    """[L, k] neighbor indices by Ca distance, ties broken by index
    (matching upstream topk determinism)."""
    L = ca.shape[0]
    d = jnp.linalg.norm(ca[:, None, :] - ca[None, :, :], axis=-1)
    # stable argsort on distance keeps index order for ties
    idx = jnp.argsort(d, axis=1, stable=True)[:, :k]
    return idx


def edge_features(bb_arrays, nbr):
    """[L, K, POS_IN + 25*16] raw features."""
    n, ca, c, o, chain, resi = bb_arrays
    cb = virtual_cb(n, ca, c)
    atoms = jnp.stack([n, ca, c, o, cb], axis=1)       # [L, 5, 3]
    L, k = nbr.shape
    same = chain[:, None] == chain[nbr]
    off = resi[:, None] - resi[nbr]
    bucket = jnp.where(
        same, jnp.clip(off + MAX_RELATIVE, 0, 2 * MAX_RELATIVE),
        2 * MAX_RELATIVE + 1)
    pos = jax.nn.one_hot(bucket, POS_IN)                # [L, K, 66]
    ai = jnp.asarray([p[0] for p in ATOM_PAIRS])
    aj = jnp.asarray([p[1] for p in ATOM_PAIRS])
    xi = atoms[:, ai, :][:, None, :, :]                 # [L, 1, 25, 3]
    xj = atoms[nbr][:, :, aj, :]                        # [L, K, 25, 3]
    d = jnp.linalg.norm(xi - xj, axis=-1)               # [L, K, 25]
    rbf = _rbf(d).reshape(L, k, NUM_ATOM_PAIRS * NUM_RBF)
    return jnp.concatenate([pos, rbf], axis=-1)


def _bb_arrays(backbone: Backbone):
    return (jnp.asarray(backbone.n), jnp.asarray(backbone.ca),
            jnp.asarray(backbone.c), jnp.asarray(backbone.o),
            jnp.asarray(backbone.chain_index),
            jnp.asarray(backbone.residue_index))


def _encode(params, bb, k):
    """Edge featurization + 3 encoder layers -> (h_v, h_e, nbr)."""
    n, ca, c, o, chain, resi = bb
    L = ca.shape[0]
    nbr = knn_graph(ca, k)                          # [L, K]
    raw = edge_features(bb, nbr)
    pos = _lin(params, "positional", raw[..., :POS_IN])
    emb = _lin(params, "edge_embedding",
               jnp.concatenate([pos, raw[..., POS_IN:]], axis=-1))
    h_e = _ln(params, "norm_edges", emb)
    h_e = _lin(params, "w_e", h_e)                  # [L, K, H]
    h_v = jnp.zeros((L, HIDDEN), h_e.dtype)

    def enc_layer(h_v, h_e, i):
        pre = f"encoder{i}."
        hvi = jnp.broadcast_to(h_v[:, None, :], (L, k, HIDDEN))
        hvj = h_v[nbr]
        inp = jnp.concatenate([hvi, h_e, hvj], axis=-1)
        msg = _message_mlp(params, pre + "w", inp)
        h_v = h_v + jnp.sum(msg, axis=1) / MESSAGE_SCALE
        h_v = _ln(params, pre + "norm1", h_v)
        dense = _lin(params, pre + "dense_out",
                     _gelu(_lin(params, pre + "dense_in", h_v)))
        h_v = _ln(params, pre + "norm2", h_v + dense)
        hvi = jnp.broadcast_to(h_v[:, None, :], (L, k, HIDDEN))
        hvj = h_v[nbr]
        inp = jnp.concatenate([hvi, h_e, hvj], axis=-1)
        h_e = _ln(params, pre + "norm3",
                  h_e + _message_mlp(params, pre + "w1", inp))
        return h_v, h_e

    for i in range(3):
        h_v, h_e = enc_layer(h_v, h_e, i)
    return h_v, h_e, nbr


def forward(params: Dict[str, jnp.ndarray], backbone: Backbone,
            k: int = K_NEIGHBORS):
    """Unconditional per-position log-probabilities [L, 21]."""
    L = len(backbone)
    k = min(k, L)
    bb = _bb_arrays(backbone)

    @jax.jit
    def run(bb):
        h_v, h_e, nbr = _encode(params, bb, k)
        zeros = jnp.zeros((L, k, HIDDEN), h_e.dtype)
        for i in range(3):
            pre = f"decoder{i}."
            hvi = jnp.broadcast_to(h_v[:, None, :], (L, k, HIDDEN))
            hvj = h_v[nbr]
            inp = jnp.concatenate([hvi, h_e, zeros, hvj], axis=-1)
            msg = _message_mlp(params, pre + "w", inp)
            h_v = h_v + jnp.sum(msg, axis=1) / MESSAGE_SCALE
            h_v = _ln(params, pre + "norm1", h_v)
            dense = _lin(params, pre + "dense_out",
                         _gelu(_lin(params, pre + "dense_in", h_v)))
            h_v = _ln(params, pre + "norm2", h_v + dense)

        logits = _lin(params, "w_out", h_v)             # [L, 21]
        return jax.nn.log_softmax(logits, axis=-1)

    return run(bb)


# ----------------------------------------------------------------------
# Autoregressive sequence design (the reference's external sequence-design
# adapter, src/external_tools/mpnn.rs, done natively: upstream ProteinMPNN
# sample() semantics — random decoding order, per-layer h_V cache frozen at
# each position's decode time, sequence context h_S visible only from
# already-decoded neighbors).

def _make_decoder_scan(params, k):
    """One decode step at position t: runs the 3 decoder layers for t only,
    reading frozen per-layer caches for visible neighbors and encoder
    states for invisible ones."""

    def step_at(t, t_rank, rank, nbr, h_e, h_v_enc, hv_stack, h_s):
        nb = nbr[t]                                       # [K]
        vis = (rank[nb] < t_rank)[:, None]                # decoded before t
        h_es_t = jnp.concatenate([h_e[t], h_s[nb]], axis=-1)   # [K, 2H]
        ctx_inv = jnp.concatenate(
            [h_e[t], jnp.zeros((nb.shape[0], HIDDEN), h_e.dtype),
             h_v_enc[nb]], axis=-1)                       # [K, 3H]
        for li in range(3):
            pre = f"decoder{li}."
            ctx_vis = jnp.concatenate([h_es_t, hv_stack[li][nb]], axis=-1)
            h_esv = jnp.where(vis, ctx_vis, ctx_inv)
            h_v_t = hv_stack[li][t]
            inp = jnp.concatenate(
                [jnp.broadcast_to(h_v_t, (nb.shape[0], HIDDEN)), h_esv],
                axis=-1)
            msg = _message_mlp(params, pre + "w", inp)
            h = h_v_t + jnp.sum(msg, axis=0) / MESSAGE_SCALE
            h = _ln(params, pre + "norm1", h)
            dense = _lin(params, pre + "dense_out",
                         _gelu(_lin(params, pre + "dense_in", h)))
            h = _ln(params, pre + "norm2", h + dense)
            hv_stack = hv_stack.at[li + 1, t].set(h)
        return hv_stack, _lin(params, "w_out", hv_stack[3, t])  # [21]

    return step_at


def design_sequences(params: Dict[str, jnp.ndarray], backbone: Backbone,
                     key, n_samples: int = 1, temperature: float = 0.1,
                     k: int = K_NEIGHBORS,
                     fixed_mask: Optional[np.ndarray] = None,
                     fixed_seq: Optional[str] = None):
    """Sample sequences for a backbone (native sequence design; the
    reference shells out to ProteinMPNN for this, external_tools/mpnn.rs).

    Returns (sequences: list[str], mean_log_prob: np.ndarray[n_samples]).
    `fixed_mask`/`fixed_seq` pin positions (redesign only the rest).
    """
    L = len(backbone)
    k = min(k, L)
    bb = _bb_arrays(backbone)
    fm = jnp.zeros((L,), bool) if fixed_mask is None \
        else jnp.asarray(fixed_mask, bool)
    fs = jnp.zeros((L,), jnp.int32) if fixed_seq is None \
        else jnp.asarray([ALPHABET.index(c) for c in fixed_seq], jnp.int32)
    step_at = _make_decoder_scan(params, k)

    @jax.jit
    def sample_one(key):
        h_v_enc, h_e, nbr = _encode(params, bb, k)
        key, ko = jax.random.split(key)
        order = jax.random.permutation(ko, L)
        rank = jnp.argsort(order)                     # rank[i] = decode time
        hv_stack = jnp.zeros((4, L, HIDDEN), h_v_enc.dtype
                             ).at[0].set(h_v_enc)
        h_s = jnp.zeros((L, HIDDEN), h_v_enc.dtype)
        seq = jnp.zeros((L,), jnp.int32)

        def body(carry, t_rank):
            hv_stack, h_s, seq, key, lp_sum = carry
            t = order[t_rank]
            hv_stack, logits = step_at(t, t_rank, rank, nbr, h_e,
                                       h_v_enc, hv_stack, h_s)
            logits = logits.at[20].set(-1e9)          # never emit X
            key, ks = jax.random.split(key)
            aa = jax.random.categorical(ks, logits / temperature)
            aa = jnp.where(fm[t], fs[t], aa).astype(jnp.int32)
            lp = jax.nn.log_softmax(logits)[aa]
            seq = seq.at[t].set(aa)
            h_s = h_s.at[t].set(params["w_s.weight"][aa])
            return (hv_stack, h_s, seq, key, lp_sum + lp), None

        (hv_stack, h_s, seq, key, lp_sum), _ = jax.lax.scan(
            body, (hv_stack, h_s, seq, key, 0.0),
            jnp.arange(L))
        return seq, lp_sum / L

    seqs, lps = [], []
    for i in range(n_samples):
        key, sub = jax.random.split(key)
        seq, lp = sample_one(sub)
        seqs.append("".join(ALPHABET[int(a)] for a in np.asarray(seq)))
        lps.append(float(lp))
    return seqs, np.asarray(lps)


def conditional_log_probs(params: Dict[str, jnp.ndarray],
                          backbone: Backbone, sequence: str, key,
                          k: int = K_NEIGHBORS) -> np.ndarray:
    """Teacher-forced per-position log P(aa_i | backbone, aa_{<i in a
    random decoding order}) — the conditional scoring mode (upstream
    ProteinMPNN `forward`; used for sequence recovery / design ranking)."""
    L = len(backbone)
    k = min(k, L)
    bb = _bb_arrays(backbone)
    seq = jnp.asarray([ALPHABET.index(c) for c in sequence], jnp.int32)
    step_at = _make_decoder_scan(params, k)

    @jax.jit
    def run(key):
        h_v_enc, h_e, nbr = _encode(params, bb, k)
        order = jax.random.permutation(key, L)
        rank = jnp.argsort(order)
        hv_stack = jnp.zeros((4, L, HIDDEN), h_v_enc.dtype
                             ).at[0].set(h_v_enc)
        h_s = params["w_s.weight"][seq] * 0.0         # filled as decoded

        def body(carry, t_rank):
            hv_stack, h_s = carry
            t = order[t_rank]
            hv_stack, logits = step_at(t, t_rank, rank, nbr, h_e,
                                       h_v_enc, hv_stack, h_s)
            lp = jax.nn.log_softmax(logits)[seq[t]]
            h_s = h_s.at[t].set(params["w_s.weight"][seq[t]])
            return (hv_stack, h_s), (t, lp)

        (_, _), (ts, lps) = jax.lax.scan(body, (hv_stack, h_s),
                                         jnp.arange(L))
        return jnp.zeros((L,)).at[ts].set(lps)

    return np.asarray(run(key))


def init_weights(key, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Random weights with the exact converted-checkpoint layout
    (PyTorch Linear [out, in]); used for golden-verification tests and as
    the loading target for published checkpoints."""
    shapes: Dict[str, tuple] = {
        "positional.weight": (POS_EMB, POS_IN),
        "positional.bias": (POS_EMB,),
        "edge_embedding.weight": (HIDDEN, POS_EMB + NUM_ATOM_PAIRS * NUM_RBF),
        "edge_embedding.bias": (HIDDEN,),
        "norm_edges.weight": (HIDDEN,), "norm_edges.bias": (HIDDEN,),
        "w_e.weight": (HIDDEN, HIDDEN), "w_e.bias": (HIDDEN,),
        "w_s.weight": (21, HIDDEN),       # sequence embedding (design path)
        "w_out.weight": (21, HIDDEN), "w_out.bias": (21,),
    }
    for i in range(3):
        p = f"encoder{i}."
        shapes.update({
            p + "w1.weight": (HIDDEN, 3 * HIDDEN), p + "w1.bias": (HIDDEN,),
            p + "w2.weight": (HIDDEN, HIDDEN), p + "w2.bias": (HIDDEN,),
            p + "w3.weight": (HIDDEN, HIDDEN), p + "w3.bias": (HIDDEN,),
            p + "w11.weight": (HIDDEN, 3 * HIDDEN), p + "w11.bias": (HIDDEN,),
            p + "w12.weight": (HIDDEN, HIDDEN), p + "w12.bias": (HIDDEN,),
            p + "w13.weight": (HIDDEN, HIDDEN), p + "w13.bias": (HIDDEN,),
            p + "dense_in.weight": (FF_HIDDEN, HIDDEN),
            p + "dense_in.bias": (FF_HIDDEN,),
            p + "dense_out.weight": (HIDDEN, FF_HIDDEN),
            p + "dense_out.bias": (HIDDEN,),
            p + "norm1.weight": (HIDDEN,), p + "norm1.bias": (HIDDEN,),
            p + "norm2.weight": (HIDDEN,), p + "norm2.bias": (HIDDEN,),
            p + "norm3.weight": (HIDDEN,), p + "norm3.bias": (HIDDEN,),
        })
    for i in range(3):
        p = f"decoder{i}."
        shapes.update({
            p + "w1.weight": (HIDDEN, 4 * HIDDEN), p + "w1.bias": (HIDDEN,),
            p + "w2.weight": (HIDDEN, HIDDEN), p + "w2.bias": (HIDDEN,),
            p + "w3.weight": (HIDDEN, HIDDEN), p + "w3.bias": (HIDDEN,),
            p + "dense_in.weight": (FF_HIDDEN, HIDDEN),
            p + "dense_in.bias": (FF_HIDDEN,),
            p + "dense_out.weight": (HIDDEN, FF_HIDDEN),
            p + "dense_out.bias": (HIDDEN,),
            p + "norm1.weight": (HIDDEN,), p + "norm1.bias": (HIDDEN,),
            p + "norm2.weight": (HIDDEN,), p + "norm2.bias": (HIDDEN,),
        })
    out = {}
    for name in sorted(shapes):
        key, sub = jax.random.split(key)
        shp = shapes[name]
        if name.endswith(".bias") or name.startswith("norm") \
                or ".norm" in name:
            if name.endswith("weight"):
                out[name] = jnp.ones(shp, dtype)
            else:
                out[name] = jnp.zeros(shp, dtype)
        else:
            fan_in = shp[-1]
            out[name] = jax.random.normal(sub, shp, dtype) \
                / math.sqrt(fan_in)
    return out


# mapping from message-mlp shorthand: encoder uses w1..w3 (node) and
# w11..w13 (edge); _message_mlp(prefix="encoderI.w") reads wI{1,2,3} via
# f-string concat "w"+"1" => "w1" etc.  Decoder prefix "decoderI.w".


def ddg_scan(log_probs, wt_sequence: str):
    """Saturation mutagenesis: ddg[i, aa] = -(logP[i, aa] - logP[i, wt]).
    Positive = destabilizing (reference ddg/mod.rs:320)."""
    lp = np.asarray(log_probs)
    out = np.zeros_like(lp)
    for i, wt in enumerate(wt_sequence):
        wt_i = ALPHABET.index(wt)
        out[i] = -(lp[i] - lp[i, wt_i])
    return out
