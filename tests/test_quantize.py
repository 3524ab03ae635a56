"""Int8 post-training quantization (models/quantize.py) + Predictor
integration.

The reference has no quantization/serving story; this is a beyond-reference
capability justified by the measured v5e int8 MXU mode (2x bf16 throughput,
tools/bench_int8_mxu.py). These tests run the lane kernels in interpret
mode on CPU and check: observer placement, float-path equivalence to
model.apply, int8-vs-float logit agreement, eligibility gating, and the
serving-surface roundtrip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from pytorch_ddp_resnet_tpu.models.quantize import (
    Int8Inference,
    calibrate,
    quantize_conv_weights,
)
from pytorch_ddp_resnet_tpu.models.resnet import ResNet


def _tiny_model(preact: bool, channels: int = 32):
    # one 2-block identity-shortcut stack at an int8-eligible width
    spec = f"c3,{channels},3,1,1 r2 n a ap8,1,0 fc{channels},10"
    model = ResNet(spec, preact=preact, use_proj=False, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.PRNGKey(0), (8, 8, 3))
    return model, params, state


def _batch(n=4, hw=8, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, hw, hw, 3),
                             jnp.float32)


def test_weight_quantization_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 8)) * 0.3, jnp.float32)
    w_q, scale = quantize_conv_weights(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (8,)
    err = np.abs(np.asarray(w) - np.asarray(w_q, np.float32) * np.asarray(scale))
    # symmetric rounding: elementwise error <= scale/2 per output channel
    assert (err <= np.asarray(scale)[None, None, None] / 2 + 1e-7).all()
    # absmax channels hit the endpoints
    assert np.abs(np.asarray(w_q)).max() == 127


@pytest.mark.parametrize("preact", [True, False])
def test_float_path_matches_model_apply(preact):
    model, params, state = _tiny_model(preact)
    x = _batch()
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    got, stats = jax.jit(inf.calibrate_fn())(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-2)  # bf16 lane conv vs lax
    # observers sit at exactly the eligible convs: both convs of both blocks
    assert sorted(stats) == [
        "01_stack/block0/conv1", "01_stack/block0/conv2",
        "01_stack/block1/conv1", "01_stack/block1/conv2"]


@pytest.mark.slow
@pytest.mark.parametrize("preact", [True, False])
def test_int8_serving_close_to_float(preact):
    model, params, state = _tiny_model(preact)
    x = _batch()
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    scales = calibrate(inf, [x])
    assert len(scales) == 4
    ql = jax.jit(inf.serve_fn(scales))(x)
    # int8 logits track float within quantization noise; top-1 agrees
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ql - ref))) < 0.1 * scale + 0.05
    assert (jnp.argmax(ql, -1) == jnp.argmax(ref, -1)).all()


@pytest.mark.slow
def test_out_of_calibration_range_clips_not_explodes():
    model, params, state = _tiny_model(True)
    inf = Int8Inference(model, params, state)
    scales = calibrate(inf, [_batch(seed=1)])
    serve = jax.jit(inf.serve_fn(scales))
    # 10x-out-of-range inputs: activations clip to +-127 but stay finite
    wild = _batch(seed=2) * 10.0
    assert bool(jnp.isfinite(serve(wild)).all())


def test_ineligible_width_returns_no_scales():
    # 16-channel v1 net (CIFAR ResNet width): 16 % 32 != 0 -> nothing to
    # quantize; the float walk must still match model.apply exactly
    model, params, state = _tiny_model(False, channels=16)
    x = _batch()
    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state)
    got, stats = jax.jit(inf.calibrate_fn())(x)
    assert stats == {}
    # same layer ops (block.apply delegation) — only jit-fusion-level
    # bf16 rounding differences remain
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-3)
    assert calibrate(inf, [x]) == {}


@pytest.mark.parametrize("preact,use_proj", [(True, True), (False, True),
                                             (True, False)])
@pytest.mark.slow
def test_transition_blocks_quantize_conv2_only(preact, use_proj):
    # WRN-shaped two-stage net: the stage transition (downsample + channel
    # doubling) quantizes conv2 (3x3/s1 at the output geometry, shortcut
    # riding its epilogue) while its strided conv1 / projection stay float
    spec = "c3,32,3,1,1 r2 r2 n a ap4,1,0 fc64,10"
    model = ResNet(spec, preact=preact, use_proj=use_proj, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.PRNGKey(0), (8, 8, 3))
    # batch 8: stage 2 is 4x4 spatial, so B*H*W needs 8 images to reach a
    # 128-lane tile (smaller batches leave stage 2 float — also correct)
    x = _batch(n=8)
    inf = Int8Inference(model, params, state)
    ql_f, stats = jax.jit(inf.calibrate_fn())(x)
    keys = sorted(stats)
    assert "01_stack/block0/conv1" in keys          # identity block
    assert "02_stack/block0/conv2" in keys          # transition conv2
    assert "02_stack/block0/conv1" not in keys      # strided conv stays float
    assert "02_stack/block1/conv1" in keys          # identity after transition
    ref, _ = model.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(ql_f), np.asarray(ref),
                               rtol=0, atol=2e-2)  # float walk still matches
    scales = calibrate(inf, [x])
    ql = jax.jit(inf.serve_fn(scales))(x)
    assert (jnp.argmax(ql, -1) == jnp.argmax(ref, -1)).all()


# --- serving surface ------------------------------------------------------

_CONFIG = {
    "dataset_cls_name": "Synthetic",
    "data_aug_train": {"ToTensorTransform": {},
                       "StandardizeWhiteningTransform": {}},
    "data_aug_test": {"ToTensorTransform": {},
                      "StandardizeWhiteningTransform": {}},
    "architecture_spec": "c3,32,3,1,1 r1 n a ap32,1,0 fc32,10",
    "preact": True,
    "use_proj": False,
    "dropout_prob": 0.0,
    "compute_dtype": "bfloat16",
    "max_steps": 20,
    "batch_size": 64,
    "num_microbatches": 1,
    "optimizer_cls_name": "SGD",
    "optimizer_args": {"lr": 0.05, "momentum": 0.9},
    "scheduler_cls_name": "None",
    "scheduler_args": {},
    "scheduler_step_unit": "none",
    "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
    "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
}


@pytest.mark.slow
def test_predictor_int8_roundtrip(tmp_path):
    from pytorch_ddp_resnet_tpu.algos.predict import load_predictor
    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic
    from pytorch_ddp_resnet_tpu.utils.config import get_config

    base = tmp_path / "models_dir" / "run"
    base.mkdir(parents=True)
    (base / "config.yaml").write_text(
        yaml.safe_dump(_CONFIG, sort_keys=False))
    config = get_config(str(tmp_path / "models_dir"), "run", mode="train",
                        data_dir=str(tmp_path / "data"), verbose=False)
    training_loop(config, setup(config, verbose=False), verbose=False)

    test = load_synthetic(None, train=False, n_test=48)
    float_pred = load_predictor(config, batch_size=16)
    int8_pred = load_predictor(config, batch_size=16, quantize="int8",
                               calib_samples=32)
    assert int8_pred.n_quantized == 2  # the r1 block's two convs
    fl = float_pred.logits(test.x)
    ql = int8_pred.logits(test.x)
    assert ql.shape == fl.shape == (48, 10)
    # quantized serving preserves the decisions on >=90% of samples and
    # matches the float path's task accuracy within a few points
    agree = float(
        (np.argmax(ql, -1) == np.argmax(fl, -1)).mean())
    assert agree >= 0.9, agree
    acc_f = float((float_pred.predict(test.x) == test.y).mean())
    acc_q = float((int8_pred.predict(test.x) == test.y).mean())
    assert acc_q >= acc_f - 0.1, (acc_q, acc_f)


@pytest.mark.slow
def test_predictor_int8_rejects_ineligible_model(tmp_path):
    from pytorch_ddp_resnet_tpu.algos.predict import load_predictor
    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.utils.config import get_config

    cfg = dict(_CONFIG, architecture_spec="c3,8,3,1,1 r1 n a ap32,1,0 fc8,10",
               max_steps=2)
    base = tmp_path / "models_dir" / "run"
    base.mkdir(parents=True)
    (base / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    config = get_config(str(tmp_path / "models_dir"), "run", mode="train",
                        data_dir=str(tmp_path / "data"), verbose=False)
    training_loop(config, setup(config, verbose=False), verbose=False)
    with pytest.raises(ValueError, match="no eligible convs"):
        load_predictor(config, batch_size=16, quantize="int8")


def _bneck_model():
    # 2-block identity bottleneck stack (post-act, ResNet-50 family):
    # in=out=32, width 32 -- every block fused-kernel eligible at 16x16/b4
    # (N = 4*16*16 = 1024 >= 32*cin = 1024)
    spec = "c3,32,3,1,1 b2,32,32,1 n a ap16,1,0 fc32,10"
    model = ResNet(spec, preact=False, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(2), (16, 16, 3))
    return model, params, state


def test_nv_bneck_serving_close_to_float():
    """The NV-trunk serving path (fused_bneck="nv", ops/pallas/bneck_nv.py)
    runs identity AND transition bottleneck blocks on int8 NV carriers and
    tracks the float model; its calibration walk records all three conv
    scales for transitions too."""
    from pytorch_ddp_resnet_tpu.models.quantize import (
        _nv_id_eligible, _nv_trans_eligible)

    # two stages: stage-2 entry is a stride-2 projection transition
    spec = "c3,32,3,1,1 b2,32,32,1 b2,64,32,2 n a ap8,1,0 fc64,10"
    model = ResNet(spec, preact=False, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(3), (16, 16, 3))
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 16, 16, 3),
                          jnp.float32)

    blocks = {f"{sname}/{bname}": blk
              for sname, layer in model.spine.layers
              if hasattr(layer, "layers")
              for bname, blk in layer.layers}
    assert _nv_id_eligible(blocks["01_stack/block0"], (32, 16, 16, 32))
    assert _nv_trans_eligible(blocks["02_stack/block0"], (32, 16, 16, 32))
    assert _nv_id_eligible(blocks["02_stack/block1"], (32, 8, 8, 64))

    ref, _ = model.apply(params, state, x, train=False)
    inf = Int8Inference(model, params, state, fused_bneck="nv")
    # legacy alias: True normalizes to the NV substrate (the round-4
    # padded-flat kernel it used to select was displaced in round 5)
    assert Int8Inference(model, params, state,
                         fused_bneck=True).fused_bneck == "nv"
    scales = calibrate(inf, [x])
    # transition observers present (the flat walk leaves these to
    # block.apply; the NV walk needs them)
    assert all(f"02_stack/block0/conv{c}" in scales for c in (1, 2, 3)), \
        sorted(scales)
    got = jax.jit(inf.serve_fn(scales))(x)
    dot = jax.jit(Int8Inference(model, params, state,
                                fused_bneck=False).serve_fn(scales))(x)
    ref = jnp.asarray(ref, jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(jnp.asarray(got, jnp.float32) - ref))) \
        < 0.1 * scale + 0.05
    agree = float((jnp.argmax(got, -1) == jnp.argmax(ref, -1)).mean())
    assert agree >= 0.9, agree
    # the NV and XLA-dot substrates stay mutually close where both run
    assert float(jnp.max(jnp.abs(jnp.asarray(got, jnp.float32)
                                 - jnp.asarray(dot, jnp.float32)))) \
        < 0.1 * scale + 0.05
