"""Shared independent 2-D mirror for the fused bottleneck kernel
family (ops/pallas/bneck_nv.py) + padded-flat packing tests.

The mirror is deliberately INDEPENDENT of any kernel's layout
construction: it computes the 3x3 taps on an explicit [rows, stride] 2-D
view with out-of-range reads as literal zeros, so bit-equality validates
tap offsets, zero-pad edge handling, and the single a1 mask at once
(reference semantics: residual_block.py:102-215). The padded-flat
kernel this mirror originally tested was displaced by the NV family in
round 5 (BASELINE.md); the mirror lives on as test_bneck_nv.py's oracle."""

import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import (
    flat_geometry,
    pad_flat,
    unpad_flat,
)


def assert_quant_equal(got, want, tie_frac=5e-4):
    """Bit-equality up to a tiny budget of requant tie flips: XLA's FMA
    contraction shifts acc*p+q by <=1 ULP, which can tip round() at a
    .5 tie; each flip moves one int8 step through the remaining chain.
    Budget 0.05% still catches any indexing bug (an off-by-one tap
    corrupts whole edge rows, percent-level)."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    frac = float((g != w).mean())
    assert frac <= tie_frac, f"{frac:.2%} of elements differ"


def _mirror_block(q_in, w1q, w2q, w3q, p1, q1, p2, q2, p3, q3, r,
                  h, w, emit_int8):
    """Pure-numpy mirror on the 2-D view; returns the padded-flat output
    with image positions exact and pad positions ZERO (the kernel leaves
    garbage there — compare through unpad_flat or a zero-pad mask)."""
    n, m, cin = q_in.shape
    rows, stride, _ = flat_geometry(h, w)
    wdt = w1q.shape[1]
    q2d = np.asarray(q_in, np.int32).reshape(n, rows, stride, cin)

    def rq(acc, p, q):
        y = np.maximum(acc.astype(np.float32) * p + q, 0.0)
        return np.clip(np.round(y), -127, 127).astype(np.int32)

    acc1 = np.einsum("nyxc,cw->nyxw", q2d, np.asarray(w1q, np.int32))
    a1 = rq(acc1, np.asarray(p1), np.asarray(q1))
    # zero outside the image (the kernel's one mask)
    img = np.zeros((rows, stride), bool)
    img[1:1 + h, 1:1 + w] = True
    a1 = np.where(img[None, :, :, None], a1, 0)

    acc2 = np.zeros((n, rows, stride, wdt), np.int64)
    w2 = np.asarray(w2q, np.int64)
    for dy in range(3):
        for dx in range(3):
            sh = np.zeros_like(a1)
            ys = slice(max(0, 1 - dy), min(rows, rows + 1 - dy))
            xs = slice(max(0, 1 - dx), min(stride, stride + 1 - dx))
            src_y = slice(ys.start + dy - 1, ys.stop + dy - 1)
            src_x = slice(xs.start + dx - 1, xs.stop + dx - 1)
            sh[:, ys, xs, :] = a1[:, src_y, src_x, :]
            acc2 += np.einsum("nyxi,io->nyxo", sh.astype(np.int64),
                              w2[dy * 3 + dx])
    a2 = rq(acc2, np.asarray(p2), np.asarray(q2))

    acc3 = np.einsum("nyxi,io->nyxo", a2.astype(np.int64),
                     np.asarray(w3q, np.int64))
    y = acc3.astype(np.float32) * np.asarray(p3) + np.asarray(q3)
    y = np.maximum(q2d.astype(np.float32) * np.float32(r) + y, 0.0)
    if emit_int8:
        out = np.clip(np.round(y), -127, 127).astype(np.int8)
    else:
        out = jnp.asarray(y, jnp.bfloat16)
    out = np.asarray(out) * img[None, :, :, None].astype(out.dtype if
                                                         emit_int8 else np.float32).astype(np.asarray(out).dtype)
    return np.asarray(out).reshape(n, m, -1)


def _rand_block_operands(rng, h, w, cin, wdt, n=2):
    rows, stride, m = flat_geometry(h, w)
    q_in = rng.integers(-127, 128, (n, m, cin)).astype(np.int8)
    # zero the pad slots the way a real carrier arrives at run entry
    img = np.zeros((rows, stride), bool)
    img[1:1 + h, 1:1 + w] = True
    q_in = (q_in.reshape(n, rows, stride, cin)
            * img[None, :, :, None]).reshape(n, m, cin).astype(np.int8)
    w1q = rng.integers(-127, 128, (cin, wdt)).astype(np.int8)
    w2q = rng.integers(-127, 128, (9, wdt, wdt)).astype(np.int8)
    w3q = rng.integers(-127, 128, (wdt, cin)).astype(np.int8)
    sc = lambda k: rng.uniform(1e-4, 3e-3, (k,)).astype(np.float32)
    off = lambda k: rng.uniform(-2.0, 2.0, (k,)).astype(np.float32)
    return q_in, w1q, w2q, w3q, sc(wdt), off(wdt), sc(wdt), off(wdt), \
        sc(cin), off(cin), 0.37


def test_flat_geometry_and_roundtrip():
    for h, w in [(56, 56), (28, 28), (14, 14), (7, 7), (5, 6)]:
        rows, stride, m = flat_geometry(h, w)
        assert stride >= w + 2 and stride & (stride - 1) == 0
        assert rows >= h + 2 and m == rows * stride and m % 32 == 0
        x = jnp.arange(2 * h * w * 3, dtype=jnp.float32).reshape(2, h, w, 3)
        assert (unpad_flat(pad_flat(x), h, w) == x).all()
