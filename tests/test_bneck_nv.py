"""Tests for ops/pallas/bneck_nv.py — the batch-in-sublanes fused
bottleneck kernel. Reuses test_bneck_mirror's independent 2-D mirror:
numerics must be bit-identical to the flat-layout kernel family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.ops.pallas.nv_common import (
    flat_geometry,
    quantize_pad_flat,
    unpad_flat,
)
from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import (
    bneck_block_nv,
    from_nv,
    nv_geometry,
    quantize_to_nv,
    to_nv,
)
from tests.test_bneck_mirror import (
    _mirror_block,
    _rand_block_operands,
    assert_quant_equal,
)


def _flat_to_nhwc_q(q_flat, h, w):
    """[N, M, Cin] padded-flat int8 -> [N, h, w, Cin] (test plumbing)."""
    return np.asarray(unpad_flat(jnp.asarray(q_flat), h, w))


def test_nv_roundtrip():
    for h, w in [(56, 56), (14, 14), (6, 5)]:
        x = jnp.arange(2 * h * w * 3, dtype=jnp.float32).reshape(
            2, h, w, 3)
        nv = to_nv(x)
        assert nv.shape == (h, nv_geometry(h, w), 2, 3)
        assert (from_nv(nv, w) == x).all()
        # W borders are real zeros
        assert float(jnp.abs(nv[:, 0]).max()) == 0.0
        assert float(jnp.abs(nv[:, 1 + w:]).max()) == 0.0


@pytest.mark.parametrize("h,w,cin,wdt,rch", [
    (6, 5, 16, 8, 2), (6, 5, 16, 8, 3), (14, 14, 32, 16, 7)])
@pytest.mark.parametrize("out_int8", [True, False])
@pytest.mark.parametrize("conv2_impl", ["dots9", "grouped3"])
def test_nv_matches_2d_mirror(h, w, cin, wdt, rch, out_int8, conv2_impl):
    rng = np.random.default_rng(0)
    ops = _rand_block_operands(rng, h, w, cin, wdt, n=32)
    x_nhwc = _flat_to_nhwc_q(ops[0], h, w)
    x_nv = to_nv(jnp.asarray(x_nhwc))
    got = bneck_block_nv(x_nv, *[jnp.asarray(o) for o in ops[1:-1]],
                         ops[-1], w=w, out_int8=out_int8,
                         conv2_impl=conv2_impl, chunk_rows=rch,
                         interpret=True)
    want_flat = _mirror_block(*ops, h=h, w=w, emit_int8=out_int8)
    want = _flat_to_nhwc_q(want_flat, h, w)
    assert_quant_equal(np.asarray(from_nv(got, w)), want)


def test_nv_chained_matches_mirror():
    """A 2-block int8-carrier NV chain is bit-equal to two chained
    independent 2-D mirror blocks (the carrier handoff preserves the
    padded-flat contract's semantics block-for-block)."""
    h, w, cin, wdt = (6, 5, 16, 8)
    rng = np.random.default_rng(2)
    ops1 = _rand_block_operands(rng, h, w, cin, wdt, n=32)
    ops2 = _rand_block_operands(rng, h, w, cin, wdt, n=32)
    j = lambda ops: [jnp.asarray(o) for o in ops[1:-1]] + [ops[-1]]

    m1 = _mirror_block(*ops1, h=h, w=w, emit_int8=True)
    m2 = _mirror_block(m1, *ops2[1:], h=h, w=w, emit_int8=False)
    want = np.asarray(unpad_flat(jnp.asarray(m2), h, w), np.float32)

    x_nv = to_nv(jnp.asarray(_flat_to_nhwc_q(ops1[0], h, w)))
    n1 = bneck_block_nv(x_nv, *j(ops1), w=w, chunk_rows=2, interpret=True)
    n2 = bneck_block_nv(n1, *j(ops2), w=w, out_int8=False, chunk_rows=3,
                        interpret=True)
    got = np.asarray(from_nv(n2, w), np.float32)
    assert_quant_equal(got, want)


# --- transition block ---------------------------------------------------------

from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import (  # noqa: E402
    bneck_transition_nv,
    nv_geometry,
)


def _mirror_transition(q_nhwc, w1q, w2q, w3q, wpq, p1, q1, p2, q2, p3, q3,
                       pp, stride, emit_int8):
    """Independent NHWC numpy mirror of the post-act transition block at
    the quantized point (conv2 at ``stride``, 1x1 projection on the
    subsampled input, no BN on the shortcut)."""
    n, h, w, cin = q_nhwc.shape
    wdt = w1q.shape[1]
    cout = w3q.shape[1]
    oh, ow = (h - 1) // stride + 1, (w - 1) // stride + 1
    q = q_nhwc.astype(np.int64)

    def rq(acc, p, qv):
        y = np.maximum(acc.astype(np.float32) * p + qv, 0.0)
        return np.clip(np.round(y), -127, 127).astype(np.int64)

    a1 = rq(np.einsum("nyxc,cw->nyxw", q, w1q.astype(np.int64)),
            np.asarray(p1), np.asarray(q1))
    pad = np.zeros((n, h + 2, w + 2, wdt), np.int64)
    pad[:, 1:1 + h, 1:1 + w] = a1
    acc2 = np.zeros((n, oh, ow, wdt), np.int64)
    for dy in range(3):
        for dx in range(3):
            tap = pad[:, dy:dy + h:stride, dx:dx + w:stride][:, :oh, :ow]
            acc2 += np.einsum("nyxi,io->nyxo", tap,
                              w2q[dy * 3 + dx].astype(np.int64))
    a2 = rq(acc2, np.asarray(p2), np.asarray(q2))
    acc3 = np.einsum("nyxi,io->nyxo", a2, w3q.astype(np.int64))
    accp = np.einsum("nyxi,io->nyxo", q[:, ::stride, ::stride],
                     wpq.astype(np.int64))
    y = acc3.astype(np.float32) * np.asarray(p3) + np.asarray(q3)
    y = np.maximum(accp.astype(np.float32) * np.asarray(pp) + y, 0.0)
    if emit_int8:
        return np.clip(np.round(y), -127, 127).astype(np.int8)
    return np.asarray(jnp.asarray(y, jnp.bfloat16), np.float32)


def _rand_transition_operands(rng, cin, wdt, cout):
    w1q = rng.integers(-127, 128, (cin, wdt)).astype(np.int8)
    w2q = rng.integers(-127, 128, (9, wdt, wdt)).astype(np.int8)
    w3q = rng.integers(-127, 128, (wdt, cout)).astype(np.int8)
    wpq = rng.integers(-127, 128, (cin, cout)).astype(np.int8)
    sc = lambda k: rng.uniform(1e-4, 3e-3, (k,)).astype(np.float32)
    off = lambda k: rng.uniform(-2.0, 2.0, (k,)).astype(np.float32)
    return (w1q, w2q, w3q, wpq, sc(wdt), off(wdt), sc(wdt), off(wdt),
            sc(cout), off(cout), sc(cout))


@pytest.mark.parametrize("h,w,cin,wdt,cout,stride,rch", [
    (6, 6, 16, 8, 32, 2, 1),    # wp_out (8) > wp_in//2 (4): pad path
    (6, 6, 16, 8, 32, 2, 3),
    (14, 14, 32, 16, 64, 2, 7), # wp_out == wp_in//2
    (6, 5, 16, 8, 32, 1, 2),    # stride-1 stage entry (channel change)
    (14, 14, 32, 16, 64, 1, 7),
])
@pytest.mark.parametrize("out_int8", [True, False])
@pytest.mark.parametrize("conv2_impl", ["dots9", "grouped3"])
def test_transition_matches_mirror(h, w, cin, wdt, cout, stride, rch,
                                   out_int8, conv2_impl):
    rng = np.random.default_rng(1)
    n = 32
    ops = _rand_transition_operands(rng, cin, wdt, cout)
    q = rng.integers(-127, 128, (n, h, w, cin)).astype(np.int8)
    got_nv = bneck_transition_nv(
        to_nv(jnp.asarray(q)), *[jnp.asarray(o) for o in ops],
        w=w, stride=stride, out_int8=out_int8, conv2_impl=conv2_impl,
        chunk_rows=rch, interpret=True)
    oh, ow = h // stride, w // stride
    assert got_nv.shape[1] == max(
        nv_geometry(oh, ow), to_nv(jnp.asarray(q)).shape[1] // stride)
    got = np.asarray(from_nv(got_nv, ow), np.float32)
    want = _mirror_transition(q, *ops, stride=stride,
                              emit_int8=out_int8).astype(np.float32)
    assert_quant_equal(got, want)


def test_transition_feeds_identity_block():
    """Transition -> identity chain: the emitted carrier (including the
    padded-wp case) is a valid input for bneck_block_nv; garbage in the
    border columns must not leak into image outputs."""
    rng = np.random.default_rng(4)
    h, w, cin, wdt, cout = 6, 6, 16, 8, 32
    n = 32
    tops = _rand_transition_operands(rng, cin, wdt, cout)
    q = rng.integers(-127, 128, (n, h, w, cin)).astype(np.int8)
    mid_nv = bneck_transition_nv(
        to_nv(jnp.asarray(q)), *[jnp.asarray(o) for o in tops],
        w=w, stride=2, chunk_rows=1, interpret=True)
    mid = _mirror_transition(q, *tops, stride=2, emit_int8=True)

    iops = _rand_block_operands(rng, 3, 3, cout, wdt, n=n)
    j = [jnp.asarray(o) for o in iops[1:-1]] + [iops[-1]]
    out_nv = bneck_block_nv(mid_nv, *j, w=3, out_int8=False,
                            chunk_rows=1, interpret=True)
    got = np.asarray(from_nv(out_nv, 3), np.float32)

    want_flat = _mirror_block(
        np.asarray(quantize_pad_flat(
            jnp.asarray(mid, jnp.float32), 1.0)),  # mid already int8
        *iops[1:-1], iops[-1], h=3, w=3, emit_int8=False)
    want = _flat_to_nhwc_q(jnp.asarray(want_flat), 3, 3).astype(np.float32)
    assert_quant_equal(got, want)


def test_transition_matches_float_block():
    """Folded-scale plumbing against the real float BottleneckResidualBlock
    (post-act, use_proj, downsampling): the quantized transition tracks it."""
    from pytorch_ddp_resnet_tpu.models.blocks import BottleneckResidualBlock
    from pytorch_ddp_resnet_tpu.models.quantize import (
        _bn_eval_affine, quantize_conv_weights)
    from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import (
        fold_transition_scales, quantize_to_nv)

    rng = np.random.default_rng(7)
    n, h, w, cin = 32, 8, 8, 32
    blk = BottleneckResidualBlock(
        channels=cin, downsample=True, preact=False, use_proj=True,
        dropout_prob=0.0, compute_dtype=jnp.float32)
    params, state, out_shape = blk.init(jax.random.PRNGKey(0), (h, w, cin))
    wdt, cout = blk.bottleneck_channels, blk.out_channels
    x = rng.normal(0, 1.0, (n, h, w, cin)).astype(np.float32)
    ref, _ = blk.apply(params, state, jnp.asarray(x), train=False)
    ref = np.asarray(ref, np.float32)

    sub = {name: layer for name, layer, _ in blk._sublayers()}
    i1, t1 = _bn_eval_affine(sub["norm1"], params["norm1"], state["norm1"])
    i2, t2 = _bn_eval_affine(sub["norm2"], params["norm2"], state["norm2"])
    i3, t3 = _bn_eval_affine(sub["norm3"], params["norm3"], state["norm3"])
    w1q, w1s = quantize_conv_weights(params["conv1"]["w"])
    w2q, w2s = quantize_conv_weights(params["conv2"]["w"])
    w3q, w3s = quantize_conv_weights(params["conv3"]["w"])
    wpq, wps = quantize_conv_weights(params["proj"]["w"])

    # oracle per-tensor scales from the float intermediates
    a1f = np.maximum(np.asarray(jnp.einsum(
        "nyxc,cw->nyxw", x, params["conv1"]["w"][0, 0])) * np.asarray(i1)
        + np.asarray(t1), 0)
    s_in = float(np.abs(x).max() / 127)
    s2 = float(np.abs(a1f).max() / 127)
    s3 = s2 * 3.0  # rough but positive; requant clip handles the rest
    folded = fold_transition_scales(
        s_in, s2, s3, 1.0, w1s, i1, t1, w2s, i2, t2, w3s, i3, t3, wps)
    got_nv = bneck_transition_nv(
        quantize_to_nv(jnp.asarray(x), s_in),
        jnp.asarray(w1q.reshape(cin, wdt)),
        jnp.asarray(w2q.reshape(9, wdt, wdt)),
        jnp.asarray(w3q.reshape(wdt, cout)),
        jnp.asarray(wpq.reshape(cin, cout)),
        *folded, w=w, stride=2, out_int8=False, chunk_rows=2,
        interpret=True)
    got = np.asarray(from_nv(got_nv, w // 2), np.float32)
    scale = max(1e-6, float(np.abs(ref).max()))
    assert float(np.abs(got - ref).max()) < 0.06 * scale


def test_batch_tile_bit_identical():
    """Tiling the batch into the grid (round 5: lets the row chunk grow
    so the halo fraction shrinks at small planes) must be bit-identical
    to the single-tile kernel — rows of distinct images never interact."""
    h, w, cin, wdt = 6, 5, 16, 8
    rng = np.random.default_rng(11)
    ops = _rand_block_operands(rng, h, w, cin, wdt, n=64)
    x_nhwc = _flat_to_nhwc_q(ops[0], h, w)
    x_nv = to_nv(jnp.asarray(x_nhwc))
    j = [jnp.asarray(o) for o in ops[1:-1]] + [ops[-1]]
    base = bneck_block_nv(x_nv, *j, w=w, chunk_rows=2, interpret=True)
    tiled = bneck_block_nv(x_nv, *j, w=w, chunk_rows=2, batch_tile=32,
                           interpret=True)
    deep = bneck_block_nv(x_nv, *j, w=w, chunk_rows=3, batch_tile=32,
                          interpret=True)
    assert (np.asarray(base) == np.asarray(tiled)).all()
    assert_quant_equal(np.asarray(from_nv(deep, w)),
                       np.asarray(from_nv(base, w)))

    tops = _rand_transition_operands(rng, cin, wdt, 32)
    q = rng.integers(-127, 128, (64, h, 6, cin)).astype(np.int8)
    tj = [jnp.asarray(o) for o in tops]
    tb = bneck_transition_nv(to_nv(jnp.asarray(q)), *tj, w=6, stride=2,
                             chunk_rows=1, interpret=True)
    tt = bneck_transition_nv(to_nv(jnp.asarray(q)), *tj, w=6, stride=2,
                             chunk_rows=1, batch_tile=32, interpret=True)
    assert (np.asarray(tb) == np.asarray(tt)).all()


def test_pick_grid_policy():
    """_pick_grid shrinks the batch tile exactly when it buys a smaller
    halo fraction; pinned on the R50/WRN b128 stage geometries."""
    from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import _pick_grid
    # stage 4 (h=7): single-tile picker forces R=1 (200% halo overhead);
    # the joint pick must do strictly better
    r, nb = _pick_grid(7, 8, 128, 2048, 512, 2048, 8)
    assert (r + 2) / r < 3.0 and nb < 128
    assert 7 % r == 0 and 128 % nb == 0
    # tiny plane where everything fits at nb=n: keep the full batch
    r, nb = _pick_grid(6, 8, 32, 16, 8, 16, 8)
    assert nb == 32 and r == 6


def test_pick_chunk_vmem_model():
    """The chunk picker must budget the s32 accumulators and the 2-level
    output window, not just the input block: the R50 stage-1 entry
    transition (cin 64 -> cout 256, 56x56, N=128) OOM'd on the real chip
    at 14 output rows (247MB used of 128MB VMEM, Mosaic report) when only
    the input was counted. Pin every R50/WRN-50-2 @224 b128 geometry to
    the calibrated model's budget."""
    from pytorch_ddp_resnet_tpu.ops.pallas.bneck_nv import (
        _pick_chunk, nv_geometry)
    n = 128
    budget = 88 * 1024 * 1024
    cases = [  # (h, w, cin, wdt, cout, stride) across both trunks
        (56, 56, 64, 64, 256, 1), (56, 56, 256, 64, 256, 1),
        (56, 56, 256, 128, 512, 2), (28, 28, 512, 128, 512, 1),
        (28, 28, 512, 256, 1024, 2), (14, 14, 1024, 256, 1024, 1),
        (14, 14, 1024, 512, 2048, 2), (7, 7, 2048, 512, 2048, 1),
        (56, 56, 64, 128, 256, 1), (56, 56, 256, 128, 256, 1),
        (56, 56, 256, 256, 512, 2), (28, 28, 512, 256, 512, 1),
        (28, 28, 512, 512, 1024, 2), (14, 14, 1024, 512, 1024, 1),
        (14, 14, 1024, 1024, 2048, 2), (7, 7, 2048, 1024, 2048, 1),
    ]
    for h, w, cin, wdt, cout, s in cases:
        wp_in = nv_geometry(h, w)
        oh, ow = h // s, w // s
        wp_out = max(wp_in // s, nv_geometry(oh, ow))
        r = _pick_chunk(oh, wp_in, n, cin, wdt, cout, wp_out, stride=s)
        assert oh % r == 0
        wp2 = wp_in // s
        row = n * (2 * s * wp_in * cin + s * wp_in * wdt * 5
                   + wp2 * wdt * 4 + wp2 * cout * 4 + wp_out * cout * 2)
        fixed = cin * wdt + 9 * wdt * wdt + wdt * cout + cin * cout
        assert r * row + fixed <= budget, (h, w, cin, wdt, cout, s, r)
    # the exact OOM geometry: 14 rows must never come back
    assert _pick_chunk(56, 64, 128, 64, 64, 256, 64, stride=1) < 14
