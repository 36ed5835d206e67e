"""Per-block heterogeneous graph encoder + LINE-style trainer (numpy).

Reimplements the reference model semantics (SURVEY.md §2.8; reference
`GCN.py`) without TensorFlow:

  * preprocessing matrix  Â = I + D^-1/2 A D^-1/2  per layer, with the
    inf->0 guard for isolated nodes (`GCN.py:32-42`);
  * the *effective* model is one fused layer — the reference computes a
    second layer but discards it (`GCN.py:130`, documented defect §2.10) —
    H = relu((5·Âa X Wa + 1·Ât X Wt + 4·Âv X Wv) / 10)   (`GCN.py:119-130`)
    with 100-d embeddings and seeded Xavier-uniform init (`GCN.py:65-68`);
  * LINE loss  -mean(log σ(label·⟨h_i, h_j⟩)) + λ Σ ||W||²/2  with Adam
    (lr 1e-4, λ 1e-4; `GCN.py:132-159`), minibatch 64, wraparound
    slicing, total_batch = 3·len(u_i)/64 (`name_disambiguation.py:547-572`).

Since the propagated inputs P_l = Â_l X are constant during training,
they are computed once; each step only touches the three 100x100 weight
matrices, so training a block is a few hundred small matmuls.
"""

from __future__ import annotations

import numpy as np

from hgcn_name_disambiguation_ray.config import LinkageConfig


def gcn_matrix(adj: np.ndarray) -> np.ndarray:
    """Â = I + D^-1/2 A D^-1/2 with isolated-node guard (GCN.py:32-42)."""
    deg = adj.sum(axis=1)
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(deg)
    dinv[np.isinf(dinv)] = 0.0
    return np.eye(adj.shape[0]) + (dinv[:, None] * adj) * dinv[None, :]


def _xavier(rng: np.random.Generator, n_in: int, n_out: int) -> np.ndarray:
    limit = np.sqrt(6.0 / (n_in + n_out))
    return rng.uniform(-limit, limit, (n_in, n_out))


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -35.0, 35.0)))


class BlockEncoder:
    """Train + embed one block. Deterministic given (inputs, seed)."""

    def __init__(self, cfg: LinkageConfig, seed: int):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

    def fit_embed(
        self,
        layers: list[np.ndarray],   # [Wa, Wt, Wv] adjacency (combined not used here)
        features: np.ndarray,       # (n, feature_dim)
        u_i: np.ndarray,
        u_j: np.ndarray,
        labels: np.ndarray,
    ) -> np.ndarray:
        cfg = self.cfg
        fusion = np.asarray(cfg.fusion) / cfg.fusion_denom
        P = [gcn_matrix(a) @ features for a in layers[:3]]  # propagated inputs
        d = features.shape[1]
        W = [_xavier(self.rng, d, cfg.embed_dim) for _ in range(3)]

        if len(u_i) == 0:
            return self._forward(P, W, fusion)

        # fold the three layers into ONE gemm per direction: propagated
        # inputs concatenated to (n, 3d) with fusion weights baked in,
        # weights stacked to (3d, e); Adam runs vectorized on the stack
        # float32 like the reference's TF graph (GCN.py placeholders)
        Pf2 = np.concatenate([f * p for f, p in zip(fusion, P)], axis=1).astype(np.float32)
        W2 = np.vstack(W).astype(np.float32)                              # (3d, e)
        labels = labels.astype(np.float32)
        m3 = np.zeros_like(W2)
        v3 = np.zeros_like(W2)
        b1, b2, eps = 0.9, 0.999, 1e-8
        lr, lam = cfg.learning_rate, cfg.l2_lambda
        bs = cfg.train_batch_size
        # floor at 1 so tiny blocks (< bs/epochs_factor pairs) still take
        # optimizer steps instead of returning a random projection
        total = max(1, int(cfg.epochs_factor * len(u_i) / bs))
        n_pairs = len(u_i)
        for t in range(1, total + 1):
            lo = ((t - 1) * bs) % n_pairs
            hi = lo + bs
            if hi <= n_pairs:
                bi, bj, bl = u_i[lo:hi], u_j[lo:hi], labels[lo:hi]
            else:  # wraparound slicing, like the reference's modular slicing
                bi = np.concatenate([u_i[lo:], u_i[: hi - n_pairs]])
                bj = np.concatenate([u_j[lo:], u_j[: hi - n_pairs]])
                bl = np.concatenate([labels[lo:], labels[: hi - n_pairs]])

            # only the rows named by this minibatch matter: forward and
            # gradients restricted to them make the per-step cost
            # O(batch·d²), independent of the block size N
            rows, inv = np.unique(np.concatenate([bi, bj]), return_inverse=True)
            ri, rj = inv[: len(bi)], inv[len(bi):]
            Pr = Pf2[rows]                                 # (b, 3d)
            Zr = Pr @ W2
            Hr = np.maximum(Zr, 0.0)
            hi_e, hj_e = Hr[ri], Hr[rj]
            dot = np.einsum("ij,ij->i", hi_e, hj_e)
            # d/ddot of -log σ(l·dot) = -l·(1-σ(l·dot))
            g_dot = -bl * (1.0 - _sigmoid(bl * dot)) / len(bi)
            # scatter-add via sort + segment-sum: both the i-side and the
            # j-side pair gradients accumulate into their rows. O(b·e)
            # instead of the O(rows·b·e) scatter gemm; np.add.at is
            # slower than either (per-element buffering)
            idx = np.concatenate([ri, rj])
            contrib = np.concatenate(
                [g_dot[:, None] * hj_e, g_dot[:, None] * hi_e], axis=0
            )
            order = np.argsort(idx, kind="stable")
            sidx = idx[order]
            starts = np.flatnonzero(np.r_[True, np.diff(sidx) > 0])
            sums = np.add.reduceat(contrib[order], starts, axis=0)
            dHr = np.zeros_like(Hr)
            dHr[sidx[starts]] = sums
            dZr = dHr * (Zr > 0.0)
            G2 = Pr.T @ dZr
            G2 += lam * W2
            m3 = b1 * m3 + (1 - b1) * G2
            v3 = b2 * v3 + (1 - b2) * G2 * G2
            W2 -= lr * (m3 / (1 - b1**t)) / (np.sqrt(v3 / (1 - b2**t)) + eps)
        return np.maximum(Pf2 @ W2, 0.0).astype(np.float64)

    @staticmethod
    def _forward(P: list[np.ndarray], W: list[np.ndarray], fusion: np.ndarray) -> np.ndarray:
        Z = sum(f * (p @ w) for f, p, w in zip(fusion, P, W))
        return np.maximum(Z, 0.0)
