"""Single-core CPU reference proxy: a faithful re-measurement stand-in for
the C++ reference's training throughput.

The reference publishes no numbers and was not mounted this session
(BASELINE.md), so the baseline is measured empirically from this proxy: a
numpy implementation that replicates the reference's *work profile* per
line — batch size 1, a serial per-timestep loop, the same matrix sizes and
count (per direction per step: one stacked [1; x_t; h_{t-1}] source vector
and 4 gate matvecs against (nhidden, 1+ninput+nhidden) matrices; SURVEY.md
§3.1 hot loop), an analytic per-timestep backward pass (~2x forward
FLOPs, as in clstm_compute.cc's backward_* kernels), the log-space CTC
alignment DP, and the sgd update. Run single-threaded (BLAS pinned to one
thread) to match the reference's single-core Eigen profile.

This intentionally BENCHMARKS the reference algorithm, it is not used by
the framework. numpy matvecs at these sizes run at a comparable rate to
Eigen's (both memory-bound small GEMV); treat the result as a +-2x proxy.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class RefLSTM:
    """Reference-style NPLSTM: four (H, 1+D+H) matrices, per-t loop."""

    def __init__(self, rng, ninput, nhidden):
        self.D, self.H = ninput, nhidden
        n = 1 + ninput + nhidden
        s = 0.01
        self.W = {k: rng.uniform(-s, s, (nhidden, n)).astype(np.float32)
                  for k in ("WGI", "WGF", "WGO", "WCI")}
        self.dW = {k: np.zeros_like(v) for k, v in self.W.items()}

    def forward(self, xs):
        T, D, H = len(xs), self.D, self.H
        self.source = np.zeros((T, 1 + D + H), np.float32)
        self.gi = np.zeros((T, H), np.float32)
        self.gf = np.zeros((T, H), np.float32)
        self.go = np.zeros((T, H), np.float32)
        self.ci = np.zeros((T, H), np.float32)
        self.state = np.zeros((T, H), np.float32)
        self.out = np.zeros((T, H), np.float32)
        h = np.zeros(H, np.float32)
        c = np.zeros(H, np.float32)
        for t in range(T):
            src = self.source[t]
            src[0] = 1.0
            src[1:1 + D] = xs[t]
            src[1 + D:] = h
            gi = sigmoid(self.W["WGI"] @ src)
            gf = sigmoid(self.W["WGF"] @ src)
            go = sigmoid(self.W["WGO"] @ src)
            ci = np.tanh(self.W["WCI"] @ src)
            c = gf * c + gi * ci
            h = np.tanh(c) * go
            self.gi[t], self.gf[t], self.go[t], self.ci[t] = gi, gf, go, ci
            self.state[t] = c
            self.out[t] = h
        return self.out

    def backward(self, dout):
        T, D, H = len(dout), self.D, self.H
        dh_next = np.zeros(H, np.float32)
        dc_next = np.zeros(H, np.float32)
        dx = np.zeros((T, D), np.float32)
        for t in range(T - 1, -1, -1):
            dh = dout[t] + dh_next
            go, gi, gf, ci = self.go[t], self.gi[t], self.gf[t], self.ci[t]
            c = self.state[t]
            tc = np.tanh(c)
            dgo = dh * tc * go * (1 - go)
            dc = dh * go * (1 - tc * tc) + dc_next
            c_prev = self.state[t - 1] if t > 0 else np.zeros(H, np.float32)
            dgf = dc * c_prev * gf * (1 - gf)
            dgi = dc * ci * gi * (1 - gi)
            dci = dc * gi * (1 - ci * ci)
            dc_next = dc * gf
            src = self.source[t]
            dsrc = (self.W["WGI"].T @ dgi + self.W["WGF"].T @ dgf
                    + self.W["WGO"].T @ dgo + self.W["WCI"].T @ dci)
            self.dW["WGI"] += np.outer(dgi, src)
            self.dW["WGF"] += np.outer(dgf, src)
            self.dW["WGO"] += np.outer(dgo, src)
            self.dW["WCI"] += np.outer(dci, src)
            dx[t] = dsrc[1:1 + D]
            dh_next = dsrc[1 + D:]
        return dx

    def update(self, lr, momentum):
        for k in self.W:
            self.W[k] += lr * self.dW[k]
            self.dW[k] *= momentum


class RefSoftmax:
    def __init__(self, rng, ninput, noutput):
        s = 0.01
        self.W = rng.uniform(-s, s, (noutput, 1 + ninput)).astype(np.float32)
        self.dW = np.zeros_like(self.W)

    def forward(self, xs):
        T = len(xs)
        self.source = np.concatenate(
            [np.ones((T, 1), np.float32), xs], axis=1)
        z = self.source @ self.W.T
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        self.out = e / e.sum(axis=1, keepdims=True)
        return self.out

    def backward(self, deltas):
        # reference backward_softmax: deltas applied as pre-activation
        self.dW += deltas.T @ self.source
        return (deltas @ self.W)[:, 1:]

    def update(self, lr, momentum):
        self.W += lr * self.dW
        self.dW *= momentum


def np_forward_algorithm(lmatch, skip=-5.0):
    T, S = lmatch.shape
    v = skip * np.arange(S, dtype=np.float64)
    path = np.zeros((T, S))
    for i in range(T):
        w = np.roll(v, 1).copy()
        w[0] = skip * i
        v = np.logaddexp(v + lmatch[i], w + lmatch[i])
        path[i] = v
    return path


def np_ctc_align(probs, target_ids, nclasses, lo=1e-5):
    targets = np.zeros((len(target_ids), nclasses), np.float32)
    targets[np.arange(len(target_ids)), target_ids] = 1.0
    outputs = np.maximum(lo, probs.astype(np.float64))
    outputs /= outputs.sum(axis=1, keepdims=True)
    lmatch = np.log(outputs @ targets.T)
    lr = np_forward_algorithm(lmatch)
    rl = np_forward_algorithm(lmatch[::-1, ::-1])[::-1, ::-1]
    both = lr + rl
    epath = np.exp(both - both.max())
    col = epath.sum(axis=0, keepdims=True)
    epath /= np.where(col == 0.0, 1e-9, col)
    aligned = np.maximum(lo, epath @ targets)
    aligned /= aligned.sum(axis=1, keepdims=True)
    return aligned.astype(np.float32)


class RefBidi:
    """Parallel(LSTM, Reversed(LSTM)) -> Softmax, reference-style."""

    def __init__(self, ninput, nhidden, noutput, seed=0):
        rng = np.random.RandomState(seed)
        self.fwd = RefLSTM(rng, ninput, nhidden)
        self.rev = RefLSTM(rng, ninput, nhidden)
        self.soft = RefSoftmax(rng, 2 * nhidden, noutput)
        self.noutput = noutput

    def train_line(self, xs, target_classes, lr=1e-4, momentum=0.9):
        H = self.fwd.H
        yf = self.fwd.forward(xs)
        yr = self.rev.forward(xs[::-1])[::-1]
        y = np.concatenate([yf, yr], axis=1)
        probs = self.soft.forward(y)
        ids = np.zeros(2 * len(target_classes) + 1, np.int64)
        ids[1::2] = target_classes
        aligned = np_ctc_align(probs, ids, self.noutput)
        deltas = aligned - probs
        dy = self.soft.backward(deltas)
        self.fwd.backward(dy[:, :H])
        self.rev.backward(dy[::-1, H:])
        for m in (self.fwd, self.rev, self.soft):
            m.update(lr, momentum)
        return probs


def measure_lines_per_sec(nlines=20, T=900, height=48, nhidden=100,
                          nclasses=96, seed=0, warmup=2):
    """Reference-profile training throughput, single core."""
    rng = np.random.RandomState(seed)
    net = RefBidi(height, nhidden, nclasses)
    lines = [rng.rand(T, height).astype(np.float32) for _ in range(nlines + warmup)]
    tgts = [rng.randint(1, nclasses, size=40) for _ in range(nlines + warmup)]
    for i in range(warmup):
        net.train_line(lines[i], tgts[i])
    t0 = time.time()
    for i in range(warmup, warmup + nlines):
        net.train_line(lines[i], tgts[i])
    dt = time.time() - t0
    return nlines / dt


if __name__ == "__main__":
    rate = measure_lines_per_sec()
    print(f"reference proxy: {rate:.2f} lines/sec "
          f"(single core, T=900, nhidden=100, nclasses=96)")
