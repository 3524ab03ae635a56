"""Tests for ops/pallas/bneck_nv.py — the batch-in-sublanes fused
bottleneck kernel. Reuses test_bneck_kernel's independent 2-D mirror:
numerics must be bit-identical to the flat-layout kernel family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.ops.pallas.bneck import (
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
from tests.test_bneck_kernel import (
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


def test_nv_matches_flat_kernel_chained():
    """NV and flat kernels are numerically interchangeable block-for-
    block, including across a 2-block int8-carrier chain."""
    from pytorch_ddp_resnet_tpu.ops.pallas.bneck import bneck_block_int8

    h, w, cin, wdt = (6, 5, 16, 8)
    rng = np.random.default_rng(2)
    ops1 = _rand_block_operands(rng, h, w, cin, wdt, n=32)
    ops2 = _rand_block_operands(rng, h, w, cin, wdt, n=32)
    j = lambda ops: [jnp.asarray(o) for o in ops[1:-1]] + [ops[-1]]

    f1 = bneck_block_int8(jnp.asarray(ops1[0]), *j(ops1), h=h, w=w,
                          interpret=True)
    f2 = bneck_block_int8(f1, *j(ops2), h=h, w=w, out_mode="flat_bf16",
                          interpret=True)
    want = np.asarray(unpad_flat(f2, h, w), np.float32)

    x_nv = to_nv(jnp.asarray(_flat_to_nhwc_q(ops1[0], h, w)))
    n1 = bneck_block_nv(x_nv, *j(ops1), w=w, chunk_rows=2, interpret=True)
    n2 = bneck_block_nv(n1, *j(ops2), w=w, out_int8=False, chunk_rows=3,
                        interpret=True)
    got = np.asarray(from_nv(n2, w), np.float32)
    assert_quant_equal(got, want)
