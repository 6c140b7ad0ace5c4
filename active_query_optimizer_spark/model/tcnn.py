"""Tree convolution network in pure numpy (forward + analytic backward).

Re-implements the reference's torch stack — ``BinaryTreeConv`` /
``TreeLayerNorm`` / ``TreeActivation(LeakyReLU)`` / ``DynamicPooling``
(``Lero/TreeConvolution/tcnn.py:4-47``) and the LeroNet head
(``Lero/model.py:322-358``: TreeConv in→256→128→64 with norm+LeakyReLU
between, global max-pool, FC 64→32→1) — without torch: this environment has
numpy only, and the nets are small (≤ ~100k params, trees ≤ ~50 nodes), so
driver-side numpy training is faster than any distributed scheme. Inference
*is* distributed — the weights broadcast into a pandas UDF
(``model/infer.py``).

Tree convolution = gather each node's (self, left, right) feature columns
by precomputed index triples, then a dense map on the 3·C_in concatenation —
numerically identical to the reference's stride-3 Conv1d over the gathered
sequence (``tcnn.py:17-26``, ``util.py:64-111``). A zero column at index 0
stands in for absent children; every layer re-prepends it so the index
tensor stays valid through the stack.

**Deliberate deviation from the reference**: its ``TreeLayerNorm`` and
``DynamicPooling`` run over the *padded* tensor (``tcnn.py:41-47``), so a
plan's score depends on which other trees share its batch — harmless in its
single-process loop, fatal for distributed scoring where Arrow batch
composition is arbitrary. Every layer here carries a real-node mask:
normalization statistics and the max-pool consider real nodes only, making
scores batch-invariant (verified by test: UDF batches == singleton local
scoring bit-for-bit up to float assoc).
"""

from __future__ import annotations

import numpy as np

LEAKY_SLOPE = 0.01


def _gather(x: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """x (B, C, N+1), idx (B, 3M) → (B, C, 3M)."""
    return np.take_along_axis(x, idx[:, None, :], axis=2)


def make_mask(batch: int, max_nodes: int, n_nodes: np.ndarray) -> np.ndarray:
    """(B, max_nodes+1) bool — True at real node columns 1..n_b; column 0
    (the zero row) and padding columns are False."""
    cols = np.arange(max_nodes + 1)[None, :]
    return (cols >= 1) & (cols <= np.asarray(n_nodes)[:, None])


class BinaryTreeConv:
    """Stride-3 tree convolution: out[b, :, m] = W @ concat(x[self],
    x[left], x[right]) + bias, with a zero column re-prepended and padded
    output columns forced to zero (mask)."""

    def __init__(self, c_in: int, c_out: int, rng: np.random.Generator) -> None:
        self.c_in, self.c_out = c_in, c_out
        # torch Conv1d default init: U(-k, k), k = 1/sqrt(C_in * kernel)
        k = 1.0 / np.sqrt(c_in * 3)
        self.W = rng.uniform(-k, k, size=(c_out, 3 * c_in))
        self.b = rng.uniform(-k, k, size=(c_out,))
        self.dW = np.zeros_like(self.W)
        self.db = np.zeros_like(self.b)

    def forward(self, x: np.ndarray, idx: np.ndarray,
                mask: np.ndarray) -> np.ndarray:
        B, C, _ = x.shape
        M = idx.shape[1] // 3
        g = _gather(x, idx)                       # (B, C, 3M)
        g = g.reshape(B, C, M, 3).transpose(0, 2, 3, 1).reshape(B, M, 3 * C)
        y = g @ self.W.T + self.b                 # (B, M, c_out)
        out = np.zeros((B, self.c_out, M + 1))
        out[:, :, 1:] = y.transpose(0, 2, 1)
        out *= mask[:, None, :]                   # padded cols stay zero
        self._cache = (x.shape, idx, g, mask)
        return out

    def backward(self, dout: np.ndarray) -> np.ndarray:
        """dout (B, c_out, M+1) → dx (B, c_in, N+1)."""
        x_shape, idx, g, mask = self._cache
        B, C, N1 = x_shape
        dout = dout * mask[:, None, :]
        dy = dout[:, :, 1:].transpose(0, 2, 1)    # (B, M, c_out)
        M = dy.shape[1]
        self.dW += np.einsum("bmo,bmi->oi", dy, g)
        self.db += dy.sum(axis=(0, 1))
        dg = dy @ self.W                          # (B, M, 3C)
        dg = dg.reshape(B, M, 3, C).transpose(0, 3, 1, 2).reshape(B, C, 3 * M)
        dx = np.zeros(x_shape)
        # scatter-add: multiple gathers of the same column accumulate
        for b in range(B):
            np.add.at(dx[b].T, idx[b], dg[b].T)
        return dx

    def params(self):
        return [(self.W, self.dW), (self.b, self.db)]


class TreeLayerNorm:
    """Per-sample normalization over real (channel, node) positions only
    (reference ``tcnn.py:40-45`` includes padding — see module docstring)."""

    EPS = 1e-5

    def forward(self, x: np.ndarray, idx: np.ndarray,
                mask: np.ndarray) -> np.ndarray:
        m = mask[:, None, :]                       # (B, 1, N+1)
        n = (x.shape[1] * mask.sum(axis=1))[:, None, None]  # real elements
        mu = (x * m).sum(axis=(1, 2), keepdims=True) / n
        var = (((x - mu) * m) ** 2).sum(axis=(1, 2), keepdims=True) / n
        inv = 1.0 / np.sqrt(var + self.EPS)
        y = (x - mu) * inv * m
        self._cache = (y, inv, m, n)
        return y

    def backward(self, dout: np.ndarray) -> np.ndarray:
        y, inv, m, n = self._cache
        dout = dout * m
        dy_sum = dout.sum(axis=(1, 2), keepdims=True)
        dyy_sum = (dout * y).sum(axis=(1, 2), keepdims=True)
        return (inv * (dout - m * dy_sum / n - y * dyy_sum / n))

    def params(self):
        return []


class TreeActivation:
    """LeakyReLU (``tcnn.py:31-38`` wraps the activation)."""

    def forward(self, x: np.ndarray, idx: np.ndarray,
                mask: np.ndarray) -> np.ndarray:
        self._mask = x >= 0
        return np.where(self._mask, x, LEAKY_SLOPE * x)

    def backward(self, dout: np.ndarray) -> np.ndarray:
        return np.where(self._mask, dout, LEAKY_SLOPE * dout)

    def params(self):
        return []


class DynamicPooling:
    """Global max-pool over real nodes (``tcnn.py:44-47``)."""

    def forward(self, x: np.ndarray, mask: np.ndarray) -> np.ndarray:
        neg = np.where(mask[:, None, :], x, -np.inf)
        self._argmax = neg.argmax(axis=2)
        self._shape = x.shape
        return neg.max(axis=2)

    def backward(self, dout: np.ndarray) -> np.ndarray:
        dx = np.zeros(self._shape)
        B, C = dout.shape
        bi, ci = np.meshgrid(np.arange(B), np.arange(C), indexing="ij")
        dx[bi, ci, self._argmax] = dout
        return dx

    def params(self):
        return []


class Linear:
    def __init__(self, c_in: int, c_out: int, rng: np.random.Generator) -> None:
        k = 1.0 / np.sqrt(c_in)
        self.W = rng.uniform(-k, k, size=(c_out, c_in))
        self.b = rng.uniform(-k, k, size=(c_out,))
        self.dW = np.zeros_like(self.W)
        self.db = np.zeros_like(self.b)

    def forward(self, x: np.ndarray) -> np.ndarray:
        self._x = x
        return x @ self.W.T + self.b

    def backward(self, dout: np.ndarray) -> np.ndarray:
        self.dW += dout.T @ self._x
        self.db += dout.sum(axis=0)
        return dout @ self.W

    def params(self):
        return [(self.W, self.dW), (self.b, self.db)]


class LeakyReLU:
    def forward(self, x: np.ndarray) -> np.ndarray:
        self._mask = x >= 0
        return np.where(self._mask, x, LEAKY_SLOPE * x)

    def backward(self, dout: np.ndarray) -> np.ndarray:
        return np.where(self._mask, dout, LEAKY_SLOPE * dout)

    def params(self):
        return []


class LeroNet:
    """TreeConv in→256→128→64 (+norm+LeakyReLU) → max-pool → FC 64→32→1;
    ``forward`` returns (scores (B,), embeddings (B, 64)) — the embedding is
    what the coreset selector consumes (``Lero/model.py:322-358``,
    ``lero_train.py:224-241``)."""

    HIDDEN = (256, 128, 64)

    def __init__(self, input_dim: int, seed: int = 0,
                 hidden: tuple[int, int, int] = HIDDEN) -> None:
        rng = np.random.default_rng(seed)
        self.input_dim = input_dim
        self.hidden = tuple(hidden)
        h1, h2, h3 = hidden
        self.tree = [
            BinaryTreeConv(input_dim, h1, rng), TreeLayerNorm(), TreeActivation(),
            BinaryTreeConv(h1, h2, rng), TreeLayerNorm(), TreeActivation(),
            BinaryTreeConv(h2, h3, rng), TreeLayerNorm(),
        ]
        self.pool = DynamicPooling()
        self.head = [Linear(h3, 32, rng), LeakyReLU(), Linear(32, 1, rng)]

    def forward(self, feats: np.ndarray, idx: np.ndarray,
                n_nodes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        mask = make_mask(feats.shape[0], feats.shape[2] - 1, n_nodes)
        x = feats
        for layer in self.tree:
            x = layer.forward(x, idx, mask)
        emb = self.pool.forward(x, mask)
        y = emb
        for layer in self.head:
            y = layer.forward(y)
        return y[:, 0], emb

    def backward(self, dscore: np.ndarray) -> None:
        """dscore (B,) — gradient w.r.t. the scalar scores."""
        d = dscore[:, None]
        for layer in reversed(self.head):
            d = layer.backward(d)
        d = self.pool.backward(d)
        for layer in reversed(self.tree):
            d = layer.backward(d)

    def params(self):
        out = []
        for layer in self.tree + self.head:
            out.extend(layer.params())
        return out

    def zero_grad(self) -> None:
        for _, g in self.params():
            g[...] = 0.0

    # ---- persistence
    def state_arrays(self) -> dict[str, np.ndarray]:
        return {f"p{i}": p for i, (p, _) in enumerate(self.params())}

    def load_state_arrays(self, arrays: dict[str, np.ndarray]) -> None:
        for i, (p, _) in enumerate(self.params()):
            p[...] = arrays[f"p{i}"]


class Adam:
    """Adam (reference trains with torch Adam, ``Lero/model.py:133``)."""

    def __init__(self, params, lr: float = 1e-3, betas=(0.9, 0.999),
                 eps: float = 1e-8) -> None:
        self.params = params
        self.lr, self.b1, self.b2, self.eps = lr, betas[0], betas[1], eps
        self.m = [np.zeros_like(p) for p, _ in params]
        self.v = [np.zeros_like(p) for p, _ in params]
        self.t = 0

    def step(self) -> None:
        self.t += 1
        for i, (p, g) in enumerate(self.params):
            self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * g
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
            mh = self.m[i] / (1 - self.b1 ** self.t)
            vh = self.v[i] / (1 - self.b2 ** self.t)
            p -= self.lr * mh / (np.sqrt(vh) + self.eps)
