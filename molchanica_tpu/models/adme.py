"""Hybrid GNN + MLP molecular property model (ADME/Tox predictor).

Reference: src/therapeutic/train.rs (Burn hybrid GNN+MLP, 51,393 params,
Adam + cosine LR) with the atom-graph encoding of src/therapeutic/gnn/
atom_bond.rs: atoms as nodes with MULTIPLEX edge layers (covalent / angle /
proper-dihedral / spatial — gnn/mod.rs:20-50), padded adjacency + masks for
fixed shapes (infer.rs:28-37 pads to MAX_ATOMS), plus a whole-molecule
descriptor MLP branch (mlp.rs). Rebuilt in flax/optax; the same model serves
regression and classification heads (TDC-style targets, mod.rs:56-80).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..molecules.characterization import FEATURE_DIM, characterize
from ..molecules.common import MoleculeCommon

MAX_ATOMS = 64
N_EDGE_LAYERS = 4      # covalent / angle(1-3) / dihedral(1-4) / spatial
ATOM_FEATS = 16
MAX_COMPS = 12         # component-graph padding (reference infer.rs MAX_COMPS)
COMP_FEATS = 12

_ELEMENT_IDX = {"C": 0, "N": 1, "O": 2, "S": 3, "P": 4, "F": 5, "Cl": 6,
                "Br": 7, "I": 8, "H": 9}


@dataclass(frozen=True)
class AdmeModelConfig:
    hidden: int = 48
    n_message_passes: int = 3
    mlp_hidden: int = 64
    comp_hidden: int = 24        # component-graph branch width
    classification: bool = False


def featurize_mol(mol: MoleculeCommon,
                  char=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]:
    """-> (node_feats [A,F], adj [L,A,A], mask [A], desc [FEATURE_DIM])."""
    char = char or characterize(mol)
    el = [e.capitalize() for e in mol.elements]
    n = min(len(el), MAX_ATOMS)
    nodes = np.zeros((MAX_ATOMS, ATOM_FEATS), np.float32)
    adj = np.zeros((N_EDGE_LAYERS, MAX_ATOMS, MAX_ATOMS), np.float32)
    mask = np.zeros((MAX_ATOMS,), np.float32)
    mask[:n] = 1.0

    ring_atoms = set(a for r in char.rings for a in r)
    neighbors = mol.adjacency()
    for i in range(n):
        e = el[i]
        idx = _ELEMENT_IDX.get(e, 10)
        if idx < 11:
            nodes[i, idx] = 1.0
        nodes[i, 11] = len(neighbors[i]) / 4.0
        nodes[i, 12] = 1.0 if i in ring_atoms else 0.0
        nodes[i, 13] = sum(1 for j in neighbors[i]
                           if el[j] == "H") / 4.0
        if mol.charges is not None:
            nodes[i, 14] = float(mol.charges[i])
        nodes[i, 15] = (mol.formal_charges[i]
                        if mol.formal_charges else 0)

    orders = mol.bond_orders or [1.0] * len(mol.bonds)
    for (i, j), o in zip(mol.bonds, orders):
        if i < n and j < n:
            adj[0, i, j] = adj[0, j, i] = float(o)
    # 1-3 (angle) layer
    for j in range(n):
        nb = [k for k in neighbors[j] if k < n]
        for a in range(len(nb)):
            for b in range(a + 1, len(nb)):
                adj[1, nb[a], nb[b]] = adj[1, nb[b], nb[a]] = 1.0
    # 1-4 (dihedral) layer
    for (j, k), o in zip(mol.bonds, orders):
        if j >= n or k >= n:
            continue
        for i in neighbors[j]:
            for l in neighbors[k]:
                if len({i, j, k, l}) == 4 and i < n and l < n:
                    adj[2, i, l] = adj[2, l, i] = 1.0
    # spatial layer (< 4.5 A, non-bonded)
    if mol.positions is not None and np.any(mol.positions):
        x = np.asarray(mol.positions)[:n]
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        close = (d < 4.5) & (d > 1e-6)
        adj[3, :n, :n] = close & (adj[0, :n, :n] == 0)

    desc = char.feature_vector()
    cnodes, cadj, cmask = featurize_components(mol)
    return nodes, adj, mask, desc, cnodes, cadj, cmask


_KIND_IDX = {"ring_system": 0, "linker": 1, "substituent": 2}


def featurize_components(mol: MoleculeCommon
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Component-graph encoding (reference gnn/component.rs): nodes are
    ring systems / linkers / substituents from the BRICS-flavoured
    decomposition; two components are adjacent when a covalent bond
    crosses them. -> (cnodes [C,F], cadj [C,C], cmask [C])."""
    from ..molecules.components import decompose

    comps = decompose(mol)[:MAX_COMPS]
    el = [e.capitalize() for e in mol.elements]
    cnodes = np.zeros((MAX_COMPS, COMP_FEATS), np.float32)
    cadj = np.zeros((MAX_COMPS, MAX_COMPS), np.float32)
    cmask = np.zeros((MAX_COMPS,), np.float32)
    owner = {}
    for ci, c in enumerate(comps):
        cmask[ci] = 1.0
        for a in c.atom_indices:
            owner[a] = ci
        els = [el[a] for a in c.atom_indices]
        heavy = [e for e in els if e != "H"]
        cnodes[ci, _KIND_IDX.get(c.kind, 2)] = 1.0
        cnodes[ci, 3] = len(heavy) / 8.0
        cnodes[ci, 4] = sum(1 for e in heavy if e not in ("C",)) / 4.0
        cnodes[ci, 5] = len(c.attachment_points) / 4.0
        cnodes[ci, 6] = 1.0 if "N" in heavy else 0.0
        cnodes[ci, 7] = 1.0 if "O" in heavy else 0.0
        cnodes[ci, 8] = 1.0 if "S" in heavy else 0.0
        cnodes[ci, 9] = 1.0 if any(e in ("F", "Cl", "Br", "I")
                                   for e in heavy) else 0.0
        if mol.formal_charges:
            cnodes[ci, 10] = sum(mol.formal_charges[a]
                                 for a in c.atom_indices)
        cnodes[ci, 11] = sum(1 for e in els if e == "H") / 8.0
    for i, j in mol.bonds:
        ci, cj = owner.get(i), owner.get(j)
        if ci is not None and cj is not None and ci != cj:
            cadj[ci, cj] = cadj[cj, ci] = 1.0
    return cnodes, cadj, cmask


class AdmeModel(nn.Module):
    """Message passing over multiplex adjacency + descriptor MLP, fused head."""
    cfg: AdmeModelConfig = AdmeModelConfig()

    @nn.compact
    def __call__(self, nodes, adj, mask, desc, cnodes=None, cadj=None,
                 cmask=None):
        # nodes [B,A,F], adj [B,L,A,A], mask [B,A], desc [B,D],
        # component branch (reference gnn/component.rs):
        # cnodes [B,C,CF], cadj [B,C,C], cmask [B,C]
        h = nn.Dense(self.cfg.hidden)(nodes)
        h = h * mask[..., None]
        for _ in range(self.cfg.n_message_passes):
            msgs = []
            for layer in range(N_EDGE_LAYERS):
                m = jnp.einsum("bij,bjh->bih", adj[:, layer], h)
                msgs.append(m)
            m = nn.Dense(self.cfg.hidden)(jnp.concatenate(msgs, axis=-1))
            h = nn.LayerNorm()(h + nn.relu(m)) * mask[..., None]
        # masked mean + max pooling
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        g_mean = (h * mask[..., None]).sum(1) / denom
        g_max = jnp.max(jnp.where(mask[..., None] > 0, h, -1e9), axis=1)
        g = jnp.concatenate([g_mean, g_max], axis=-1)

        d = nn.relu(nn.Dense(self.cfg.mlp_hidden)(desc))
        d = nn.relu(nn.Dense(self.cfg.mlp_hidden)(d))

        parts = [g, d]
        if cnodes is not None:
            hc = nn.Dense(self.cfg.comp_hidden)(cnodes) * cmask[..., None]
            for _ in range(2):
                mc = jnp.einsum("bij,bjh->bih", cadj, hc)
                mc = nn.Dense(self.cfg.comp_hidden)(mc)
                hc = nn.LayerNorm()(hc + nn.relu(mc)) * cmask[..., None]
            cden = jnp.maximum(cmask.sum(-1, keepdims=True), 1.0)
            parts.append((hc * cmask[..., None]).sum(1) / cden)

        z = jnp.concatenate(parts, axis=-1)
        z = nn.relu(nn.Dense(self.cfg.mlp_hidden)(z))
        out = nn.Dense(1)(z)[..., 0]
        return out


@dataclass
class StandardScaler:
    """Target normalization (reference StandardScaler, train.rs:1345)."""
    mean: float = 0.0
    std: float = 1.0

    @staticmethod
    def fit(y):
        return StandardScaler(float(np.mean(y)), float(np.std(y) + 1e-9))

    def transform(self, y):
        return (np.asarray(y) - self.mean) / self.std

    def inverse(self, y):
        return np.asarray(y) * self.std + self.mean


def train_adme(
    mols, targets,
    cfg: AdmeModelConfig = AdmeModelConfig(),
    n_epochs: int = 60,
    lr: float = 3e-3,
    batch_size: int = 32,
    seed: int = 0,
    val_fraction: float = 0.15,
):
    """Train on (MoleculeCommon list, float targets). Returns
    (params, scaler, history). Adam + cosine decay (reference train.rs:37-44).
    """
    import optax

    feats = [featurize_mol(m) for m in mols]
    nodes, adj, mask, desc, cnodes, cadj, cmask = (
        jnp.asarray(np.stack([f[i] for f in feats])) for i in range(7))
    y_raw = np.asarray(targets, np.float32)
    scaler = StandardScaler.fit(y_raw) if not cfg.classification \
        else StandardScaler()
    y = jnp.asarray(scaler.transform(y_raw)) if not cfg.classification \
        else jnp.asarray(y_raw)

    n = len(mols)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, tr_idx = perm[:n_val], perm[n_val:]

    model = AdmeModel(cfg)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, nodes[:1], adj[:1], mask[:1], desc[:1],
                        cnodes[:1], cadj[:1], cmask[:1])
    n_steps = max(1, (len(tr_idx) // batch_size)) * n_epochs
    tx = optax.adam(optax.cosine_decay_schedule(lr, n_steps))
    opt_state = tx.init(params)

    def loss_fn(p, b):
        pred = model.apply(p, nodes[b], adj[b], mask[b], desc[b],
                           cnodes[b], cadj[b], cmask[b])
        if cfg.classification:
            return jnp.mean(optax.sigmoid_binary_cross_entropy(pred, y[b]))
        return jnp.mean((pred - y[b]) ** 2)

    @jax.jit
    def step(p, o, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, l

    history = []
    for epoch in range(n_epochs):
        rng.shuffle(tr_idx)
        for s in range(0, len(tr_idx) - batch_size + 1, batch_size):
            b = jnp.asarray(tr_idx[s:s + batch_size])
            params, opt_state, l = step(params, opt_state, b)
        if len(tr_idx) < batch_size:
            b = jnp.asarray(tr_idx)
            params, opt_state, l = step(params, opt_state, b)
        vl = float(loss_fn(params, jnp.asarray(val_idx)))
        history.append((epoch, float(l), vl))
    return params, scaler, history


def predict_adme(params, mols, scaler=None,
                 cfg: AdmeModelConfig = AdmeModelConfig()):
    """<1 ms/mol-scale batched inference (reference infer.rs)."""
    feats = [featurize_mol(m) for m in mols]
    model = AdmeModel(cfg)
    pred = model.apply(
        params, *(jnp.asarray(np.stack([f[i] for f in feats]))
                  for i in range(7)))
    pred = np.asarray(pred)
    if cfg.classification:
        return 1.0 / (1.0 + np.exp(-pred))
    return scaler.inverse(pred) if scaler else pred
