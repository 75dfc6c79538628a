"""Mesh sharding tests on 8 virtual CPU devices.

Checks the SPMD story end-to-end: batch sharded over the data axis, params
replicated or TP-sharded over the model axis, gradients reduced by
XLA-inserted collectives — and that the sharded step computes the SAME
numbers as the single-device step.
"""
import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simple_multimodal_tpu.models import MultimodalEmotionModel
from simple_multimodal_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    params_shardings,
)
from simple_multimodal_tpu.train.optim import make_optimizer
from simple_multimodal_tpu.train.state import TrainState
from simple_multimodal_tpu.train.steps import make_eval_step, make_train_step

from test_models import make_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup(tiny_config):
    c = dataclasses.replace(tiny_config)
    c.fusion_type = "early"
    model = MultimodalEmotionModel(c)
    batch = make_batch(c, B=8, seed=7)
    params = jax.device_get(jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["text"], batch["audio"], batch["video"]
    ))
    return c, model, batch, params


def _put_batch(batch, sharding):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if isinstance(x, np.ndarray) else x,
        {k: batch[k] for k in ("text", "audio", "video", "emotion")},
    )


def test_dp_matches_single_device(setup):
    c, model, batch, params = setup
    mesh = make_mesh((8, 1))
    b_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())

    eval_step = make_eval_step(model)
    single = jax.device_get(
        eval_step(params, {k: batch[k] for k in
                           ("text", "audio", "video", "emotion")})
    )
    sharded_params = jax.device_put(params, rep)
    sharded = jax.device_get(eval_step(sharded_params, _put_batch(batch, b_sh)))
    np.testing.assert_allclose(np.asarray(single["logits"]),
                               np.asarray(sharded["logits"]), atol=1e-5)


def test_dp_train_step_matches(setup):
    c, model, batch, params = setup
    dev_batch = {k: batch[k] for k in ("text", "audio", "video", "emotion")}

    def run(mesh_shape):
        mesh = make_mesh(mesh_shape)
        p = jax.device_put(params, NamedSharding(mesh, P()))
        tx = make_optimizer(c, p, total_steps=10)
        state = TrainState.create(p, tx, jax.random.PRNGKey(3))
        step = make_train_step(model, tx, c, augment=False,
                               compute_contrastive_loss=False)
        b = _put_batch(dev_batch, batch_sharding(mesh))
        state, parts = step(state, b)
        return (float(parts["total_loss"]),
                jax.device_get(state.params))

    loss_1, params_1 = run((1, 1))
    loss_8, params_8 = run((8, 1))
    assert abs(loss_1 - loss_8) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tp_matches_replicated(setup):
    c, model, batch, params = setup
    dev_batch = {k: batch[k] for k in ("text", "audio", "video", "emotion")}
    eval_step = make_eval_step(model)
    ref = jax.device_get(eval_step(params, dev_batch))

    mesh = make_mesh((4, 2))
    p_sh = params_shardings(mesh, params)
    # at least one param actually TP-sharded
    specs = {s.spec for s in jax.tree_util.tree_leaves(p_sh)}
    assert any(s != P() for s in specs), "no TP-partitioned params"
    tp_params = jax.device_put(params, p_sh)
    out = jax.device_get(eval_step(tp_params, _put_batch(batch,
                                                         batch_sharding(mesh))))
    np.testing.assert_allclose(np.asarray(ref["logits"]),
                               np.asarray(out["logits"]), atol=1e-4)


def test_resume_across_topologies(tiny_config, tmp_path_factory):
    """Checkpoint saved on a (1,1) mesh resumes on an (8,1) mesh (SURVEY §7:
    checkpoint save/restore across topologies)."""
    import dataclasses
    import os

    from simple_multimodal_tpu.data import (
        create_dataloader,
        create_sample_dataset,
        get_dataset,
    )
    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    d = tmp_path_factory.mktemp("topo_data")
    create_sample_dataset(str(d), num_samples_per_emotion=2, duration=0.3)
    c = dataclasses.replace(tiny_config)
    c.fusion_type = "early"
    c.num_epochs = 1
    c.batch_size = 8
    c.save_path = str(tmp_path_factory.mktemp("topo_ckpt"))
    loaders = {
        split: create_dataloader(
            get_dataset("sample", str(d), split, c), batch_size=8,
            shuffle=(split == "train"))
        for split in ("train", "val")
    }

    c1 = dataclasses.replace(c)
    c1.mesh_shape = (1, 1)
    t1 = AdvancedTrainer(model=create_model(c, "standard"), config=c1,
                         train_loader=loaders["train"],
                         val_loader=loaders["val"])
    t1.train_epoch()
    ckpt = os.path.join(c.save_path, "checkpoint_epoch_1")
    t1.save_checkpoint("checkpoint_epoch_1", 0, {"val_f1_macro": 0.1})
    step_at_save = int(t1.state.step)
    assert step_at_save > 0

    c8 = dataclasses.replace(c)
    c8.mesh_shape = (8, 1)
    t2 = AdvancedTrainer(model=create_model(c, "standard"), config=c8,
                         train_loader=loaders["train"],
                         val_loader=loaders["val"], resume_from=ckpt)
    assert int(t2.state.step) == step_at_save
    assert t2.start_epoch == 1
    metrics = t2.train_epoch()  # one epoch on the 8-way mesh from restored state
    assert np.isfinite(metrics["total_loss"])


def test_trainer_dp_mesh(tiny_config, tmp_path_factory):
    """AdvancedTrainer end-to-end on an 8-way data-parallel mesh."""
    import dataclasses

    from simple_multimodal_tpu.data import create_dataloader, create_sample_dataset, get_dataset
    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    d = tmp_path_factory.mktemp("mesh_data")
    create_sample_dataset(str(d), num_samples_per_emotion=2, duration=0.3)
    c = dataclasses.replace(tiny_config)
    c.fusion_type = "early"
    c.num_epochs = 1
    c.batch_size = 8
    c.mesh_shape = (8, 1)
    loaders = {
        split: create_dataloader(
            get_dataset("sample", str(d), split, c), batch_size=8,
            shuffle=(split == "train"))
        for split in ("train", "val")
    }
    trainer = AdvancedTrainer(
        model=create_model(c, "standard"), config=c,
        train_loader=loaders["train"], val_loader=loaders["val"],
    )
    assert dict(trainer.mesh.shape) == {"data": 8, "model": 1}
    history = trainer.train()  # full loop: epoch, validate, checkpoints, plots
    assert len(history["train_losses"]) == 1
    assert np.isfinite(history["train_losses"][0])
    assert 0.0 <= history["val_accuracies"][0] <= 1.0
    # deferred best checkpoint written at end when F1 improved
    import os

    if trainer.best_val_f1 > 0:
        assert os.path.exists(os.path.join(c.save_path, "best_model"))


def test_spmd_kernels_eval_parity(setup):
    """Pallas kernels forced on under a (4,2) mesh (shard_map over the
    ambient mesh) match the single-device kernel outputs <= 1e-4."""
    c, model, batch, params = setup
    from simple_multimodal_tpu.parallel.mesh import (
        batch_shardings, make_mesh, params_shardings, set_current_mesh,
    )

    c2 = dataclasses.replace(c)
    c2.fusion_type = c.fusion_type  # attached post-init; replace drops it
    c2.flash_attention = True
    # batch of 8 so the (4,2) mesh divides it
    batch8 = make_batch(c2, B=8, seed=9)
    fl_model = MultimodalEmotionModel(c2)

    set_current_mesh(None)  # single-device kernel path
    ref = jax.jit(lambda p, t, a, v: fl_model.apply(p, t, a, v)[
        "emotion_logits"])(params, batch8["text"], batch8["audio"],
                          batch8["video"])
    ref = np.asarray(ref)

    mesh = make_mesh((4, 2))  # registers itself as ambient
    p_sh = jax.device_put(params, params_shardings(mesh, params))
    feats = {k: batch8[k] for k in ("text", "audio", "video")}
    dev = jax.device_put(feats, batch_shardings(mesh, feats))
    out = jax.jit(lambda p, t, a, v: fl_model.apply(p, t, a, v)[
        "emotion_logits"])(p_sh, dev["text"], dev["audio"], dev["video"])
    out = np.asarray(out)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_spmd_attention_block_direct():
    """attention_block under an ambient (4,2) mesh == no-mesh result."""
    from simple_multimodal_tpu.ops.pallas.attention_block import (
        attention_block,
    )
    from simple_multimodal_tpu.parallel.mesh import make_mesh, set_current_mesh

    B, S, H, D = 8, 130, 2, 16
    E = H * D
    rng = np.random.default_rng(31)
    x = rng.standard_normal((B, S, E)).astype(np.float32)
    ws = [(rng.standard_normal((E, E)) * 0.1).astype(np.float32)
          for _ in range(4)]
    bs = [(rng.standard_normal((E,)) * 0.1).astype(np.float32)
          for _ in range(4)]

    def f(x):
        return attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                               ws[3], bs[3], num_heads=H)

    set_current_mesh(None)
    ref = np.asarray(jax.jit(f)(x))
    make_mesh((4, 2))
    out = np.asarray(jax.jit(f)(x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_spmd_deberta_attention_grads():
    """Grads through the shard_mapped DeBERTa kernel (incl. psum-reduced
    table cotangents) match the no-mesh grads."""
    from simple_multimodal_tpu.ops.pallas.deberta_attention import (
        deberta_attention,
    )
    from simple_multimodal_tpu.parallel.mesh import make_mesh, set_current_mesh

    B, S, H, D, span = 8, 40, 2, 16, 16
    rng = np.random.default_rng(32)
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos_k = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    pos_q = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    w = rng.standard_normal((B, S, H, D)).astype(np.float32)

    def loss(q, k, v, pos_k, pos_q):
        out = deberta_attention(q, k, v, pos_k, pos_q, mask, span=span,
                                max_position=128)
        return jnp.sum(out * w)

    import jax.numpy as jnp  # noqa: F401 (used in loss)

    set_current_mesh(None)
    g_ref = jax.grad(loss, argnums=(0, 1, 3))(q, k, v, pos_k, pos_q)
    make_mesh((4, 2))
    g_mesh = jax.grad(loss, argnums=(0, 1, 3))(q, k, v, pos_k, pos_q)
    for a, b in zip(g_mesh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_spmd_kernel_dropout_paths():
    """Training-mode kernel dropout under a (4,2) mesh: the per-shard seed
    decorrelation (axis_index inside shard_map) compiles and runs for all
    three fused kernels, deterministically for a fixed seed."""
    import jax.numpy as jnp

    from simple_multimodal_tpu.ops.pallas.attention_block import (
        attention_block,
    )
    from simple_multimodal_tpu.ops.pallas.deberta_attention import (
        deberta_attention,
    )
    from simple_multimodal_tpu.ops.pallas.ffn_block import ffn_block
    from simple_multimodal_tpu.parallel.mesh import make_mesh, set_current_mesh

    rng = np.random.default_rng(33)
    B, S, H, D, span = 8, 40, 2, 16, 16
    E = H * D
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos = rng.standard_normal((2 * span, H, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    x = rng.standard_normal((B, 140, E)).astype(np.float32)
    ws = [(rng.standard_normal((E, E)) * 0.1).astype(np.float32)
          for _ in range(4)]
    bs = [(rng.standard_normal((E,)) * 0.1).astype(np.float32)
          for _ in range(4)]
    w1 = (rng.standard_normal((E, 4 * E)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((4 * E,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((4 * E, E)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((E,)) * 0.1).astype(np.float32)
    seed = jnp.int32(777)

    make_mesh((4, 2))
    try:
        att = deberta_attention(q, q, q, pos, pos, mask, span=span,
                                max_position=128, dropout_rate=0.2,
                                dropout_seed=seed)
        att2 = deberta_attention(q, q, q, pos, pos, mask, span=span,
                                 max_position=128, dropout_rate=0.2,
                                 dropout_seed=seed)
        assert np.isfinite(np.asarray(att)).all()
        np.testing.assert_array_equal(np.asarray(att), np.asarray(att2))

        blk = attention_block(x, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
                              ws[3], bs[3], num_heads=H, dropout_rate=0.2,
                              dropout_seed=seed)
        assert np.isfinite(np.asarray(blk)).all()

        ffn = ffn_block(x, w1, b1, w2, b2, dropout_rate_mid=0.2,
                        dropout_rate_out=0.1, dropout_seed=seed)
        assert np.isfinite(np.asarray(ffn)).all()
    finally:
        set_current_mesh(None)


def test_dp_train_step_with_fused_kernels(setup):
    """Full train step with flash forced on over an (8,1) mesh: the three
    fused kernels (+ their Pallas backwards and in-kernel dropout) compose
    with nn.scan, shard_map, donation, and the sharded batch."""
    import copy

    c, model, batch, params = setup
    # deepcopy, not dataclasses.replace: fusion_type is attached after
    # construction (reference-parity config style) and replace drops it
    c = copy.deepcopy(c)
    c.flash_attention = True
    model = MultimodalEmotionModel(c)
    dev_batch = {k: batch[k] for k in ("text", "audio", "video", "emotion")}

    mesh = make_mesh((8, 1))
    try:
        p = jax.device_put(params, NamedSharding(mesh, P()))
        tx = make_optimizer(c, p, total_steps=10)
        state = TrainState.create(p, tx, jax.random.PRNGKey(3))
        step = make_train_step(model, tx, c, augment=False,
                               compute_contrastive_loss=False)
        b = _put_batch(dev_batch, batch_sharding(mesh))
        state, parts = step(state, b)
        state, parts = step(state, _put_batch(dev_batch,
                                              batch_sharding(mesh)))
        assert np.isfinite(float(parts["total_loss"]))
    finally:
        from simple_multimodal_tpu.parallel.mesh import set_current_mesh

        set_current_mesh(None)
