"""ProteinMPNN forward pass: golden verification against an independent
numpy implementation (structured after the reference's Rust loops,
/root/reference/src/therapeutic/ddg/mpnn.rs), plus physical invariances.
"""
import math

import numpy as np
import pytest

from molchanica_tpu.therapeutic.mpnn import (
    ALPHABET, ATOM_PAIRS, HIDDEN, MAX_RELATIVE, MESSAGE_SCALE, NUM_RBF,
    POS_IN, Backbone, ddg_scan, forward, init_weights)


def _backbone(L=24, seed=0):
    """Synthetic helix-like backbone."""
    rng = np.random.default_rng(seed)
    t = np.arange(L) * 100.0 * np.pi / 180.0
    ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(L)],
                  axis=1)
    n = ca + rng.normal(0, 0.1, (L, 3)) + [1.33, 0, -0.5]
    c = ca + rng.normal(0, 0.1, (L, 3)) + [-1.2, 0.4, 0.4]
    o = c + rng.normal(0, 0.05, (L, 3)) + [0.0, 1.23, 0]
    return Backbone(n=n, ca=ca, c=c, o=o,
                    chain_index=np.zeros(L, int),
                    residue_index=np.arange(L))


# ---- independent numpy forward (per-edge loops, like the Rust code) ----

def _np_gelu(x):
    from scipy.special import erf
    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def _np_ln(p, pre, x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * p[pre + ".weight"] \
        + p[pre + ".bias"]


def _np_lin(p, pre, x):
    return x @ np.asarray(p[pre + ".weight"]).T + np.asarray(p[pre + ".bias"])


def _np_mlp(p, pre, x):
    h = _np_gelu(_np_lin(p, pre + "1", x))
    h = _np_gelu(_np_lin(p, pre + "2", h))
    return _np_lin(p, pre + "3", h)


def _np_forward(params, bb, k):
    p = {kk: np.asarray(v, np.float64) for kk, v in params.items()}
    L = len(bb)
    # virtual cb
    bvec = bb.ca - bb.n
    cvec = bb.c - bb.ca
    a = np.cross(bvec, cvec)
    cb = -0.5827343 * a + 0.5680283 * bvec - 0.5406747 * cvec + bb.ca
    atoms = np.stack([bb.n, bb.ca, bb.c, bb.o, cb], axis=1)
    # knn with index tie-break
    nbr = np.zeros((L, k), int)
    for i in range(L):
        d = np.linalg.norm(bb.ca[i] - bb.ca, axis=1)
        nbr[i] = sorted(range(L), key=lambda j: (d[j], j))[:k]
    # edge features
    mu = np.linspace(2.0, 22.0, NUM_RBF)
    sig = 20.0 / NUM_RBF
    feats = np.zeros((L, k, POS_IN + 25 * NUM_RBF))
    for i in range(L):
        for e in range(k):
            j = nbr[i, e]
            same = bb.chain_index[i] == bb.chain_index[j]
            if same:
                b = int(np.clip(bb.residue_index[i] - bb.residue_index[j]
                                + MAX_RELATIVE, 0, 2 * MAX_RELATIVE))
            else:
                b = 2 * MAX_RELATIVE + 1
            feats[i, e, b] = 1.0
            for pi, (fa, ta) in enumerate(ATOM_PAIRS):
                d = np.linalg.norm(atoms[i, fa] - atoms[j, ta])
                feats[i, e, POS_IN + pi * NUM_RBF:
                      POS_IN + (pi + 1) * NUM_RBF] = \
                    np.exp(-(((d - mu) / sig) ** 2))
    pos = _np_lin(p, "positional", feats[..., :POS_IN])
    emb = _np_lin(p, "edge_embedding",
                  np.concatenate([pos, feats[..., POS_IN:]], axis=-1))
    h_e = _np_lin(p, "w_e", _np_ln(p, "norm_edges", emb))
    h_v = np.zeros((L, HIDDEN))
    for li in range(3):
        pre = f"encoder{li}."
        inp = np.concatenate(
            [np.repeat(h_v[:, None], k, 1), h_e, h_v[nbr]], axis=-1)
        msg = _np_mlp(p, pre + "w", inp)
        h_v = _np_ln(p, pre + "norm1", h_v + msg.sum(1) / MESSAGE_SCALE)
        dense = _np_lin(p, pre + "dense_out",
                        _np_gelu(_np_lin(p, pre + "dense_in", h_v)))
        h_v = _np_ln(p, pre + "norm2", h_v + dense)
        inp = np.concatenate(
            [np.repeat(h_v[:, None], k, 1), h_e, h_v[nbr]], axis=-1)
        h_e = _np_ln(p, pre + "norm3", h_e + _np_mlp(p, pre + "w1", inp))
    zeros = np.zeros((L, k, HIDDEN))
    for li in range(3):
        pre = f"decoder{li}."
        inp = np.concatenate(
            [np.repeat(h_v[:, None], k, 1), h_e, zeros, h_v[nbr]], axis=-1)
        msg = _np_mlp(p, pre + "w", inp)
        h_v = _np_ln(p, pre + "norm1", h_v + msg.sum(1) / MESSAGE_SCALE)
        dense = _np_lin(p, pre + "dense_out",
                        _np_gelu(_np_lin(p, pre + "dense_in", h_v)))
        h_v = _np_ln(p, pre + "norm2", h_v + dense)
    logits = _np_lin(p, "w_out", h_v)
    m = logits.max(-1, keepdims=True)
    return logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))


@pytest.mark.heavy
def test_golden_vs_independent_numpy():
    import jax

    bb = _backbone(L=20)
    params = init_weights(jax.random.PRNGKey(3))
    lp_jax = np.asarray(forward(params, bb, k=12))
    lp_np = _np_forward(params, bb, k=12)
    assert lp_jax.shape == (20, 21)
    np.testing.assert_allclose(lp_jax, lp_np, atol=2e-4)


def test_log_probs_normalized_and_rigid_invariant():
    import jax

    bb = _backbone(L=16, seed=1)
    params = init_weights(jax.random.PRNGKey(5))
    lp = np.asarray(forward(params, bb, k=10))
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-5)
    # rigid-body invariance: rotate + translate the backbone
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    shift = np.array([11.0, -3.0, 7.0])
    bb2 = Backbone(n=bb.n @ R.T + shift, ca=bb.ca @ R.T + shift,
                   c=bb.c @ R.T + shift, o=bb.o @ R.T + shift,
                   chain_index=bb.chain_index,
                   residue_index=bb.residue_index)
    lp2 = np.asarray(forward(params, bb2, k=10))
    np.testing.assert_allclose(lp, lp2, atol=5e-4)


def test_ddg_scan_semantics():
    lp = np.log(np.full((2, 21), 0.01))
    lp[0, ALPHABET.index("A")] = np.log(0.5)
    lp[0, ALPHABET.index("G")] = np.log(0.1)
    scan = ddg_scan(lp, "GA")
    # wild type G at pos 0: mutating to the favoured A must be stabilizing
    assert scan[0, ALPHABET.index("A")] < 0
    assert scan[0, ALPHABET.index("G")] == 0
    # position 1 wild-type A: everything equal-prob -> ddg 0
    np.testing.assert_allclose(scan[1], 0.0, atol=1e-12)


@pytest.mark.heavy
def test_design_sequences_and_conditional_scoring():
    """Native sequence design (upstream sample() semantics): samples are
    valid sequences, fixed positions are pinned, teacher-forced scoring of
    a sampled sequence is finite and higher at low temperature than the
    uniform floor."""
    import jax
    import numpy as np

    from molchanica_tpu.therapeutic.mpnn import (
        ALPHABET, conditional_log_probs, design_sequences, init_weights)

    bb = _backbone(24)
    params = init_weights(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    seqs, lps = design_sequences(params, bb, key, n_samples=2,
                                 temperature=0.5)
    assert len(seqs) == 2 and all(len(s) == 24 for s in seqs)
    assert all(c in ALPHABET[:20] for s in seqs for c in s)  # no X
    assert np.isfinite(lps).all()

    # pin the first 5 positions to alanine
    fm = np.zeros(24, bool)
    fm[:5] = True
    seqs_f, _ = design_sequences(params, bb, key, n_samples=1,
                                 temperature=0.5, fixed_mask=fm,
                                 fixed_seq="A" * 24)
    assert seqs_f[0][:5] == "AAAAA"

    # deterministic given the same key
    seqs2, _ = design_sequences(params, bb, key, n_samples=2,
                                temperature=0.5)
    assert seqs == seqs2

    lp = conditional_log_probs(params, bb, seqs[0], jax.random.PRNGKey(2))
    assert lp.shape == (24,) and np.isfinite(lp).all()
    assert (lp <= 0.0).all()


def test_convert_mpnn_weights_roundtrip(tmp_path):
    """scripts/convert_mpnn_weights.py maps an upstream-layout torch
    checkpoint onto our flat layout losslessly and its golden replay
    verifies (the reference's --verify-mpnn pattern, main.rs:78-112)."""
    import jax
    import numpy as np
    import torch

    import scripts.convert_mpnn_weights as cw
    from molchanica_tpu.therapeutic.mpnn import init_weights

    params = init_weights(jax.random.PRNGKey(3))
    inv = {v: k for k, v in cw.TOP_MAP.items()}
    for i in range(3):
        inv.update({v: k for k, v in cw._layer_map("encoder", i).items()})
        inv.update({v: k for k, v in cw._layer_map("decoder", i).items()})
    sd = {inv[k]: torch.tensor(np.asarray(v)) for k, v in params.items()}
    src = tmp_path / "fake.pt"
    dst = tmp_path / "conv.npz"
    torch.save({"model_state_dict": sd}, src)
    cw.convert(str(src), str(dst))

    d = dict(np.load(dst))
    golden = d.pop("__golden_log_probs__")
    for k, v in params.items():
        np.testing.assert_array_equal(d[k], np.asarray(v))
    from molchanica_tpu.therapeutic import mpnn
    lp = np.asarray(mpnn.forward(
        {k: mpnn.jnp.asarray(v) for k, v in d.items()},
        cw.golden_backbone()))
    assert float(np.abs(lp - golden).max()) < cw.TOL
