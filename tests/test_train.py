import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_multimodal_tpu.models import MultimodalEmotionModel
from simple_multimodal_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from simple_multimodal_tpu.train.optim import make_optimizer, make_schedule
from simple_multimodal_tpu.train.state import TrainState
from simple_multimodal_tpu.train.steps import make_eval_step, make_train_step

from test_models import make_batch


@pytest.fixture(scope="module")
def setup(tiny_config):
    c = dataclasses.replace(tiny_config)
    c.fusion_type = "early"
    model = MultimodalEmotionModel(c)
    batch = make_batch(c, B=4, seed=3)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["text"], batch["audio"], batch["video"]
    )
    # host copies: tests donate their device buffers into train steps
    return c, model, batch, jax.device_get(params)


def test_schedule_no_nan_short_runs():
    for total in (2, 5, 8, 100):
        sched = make_schedule(1e-4, total)
        vals = [float(sched(s)) for s in range(total + 2)]
        assert all(np.isfinite(v) for v in vals)
        assert max(vals) <= 1e-4 * 1.0001


def test_train_step_learns(setup):
    c, model, batch, params = setup
    # The default LR (1e-4 with OneCycle warmup) leaves this tiny 4-sample
    # problem near its CE plateau for the first ~30 steps on most init
    # seeds (verified: unlearnable at seeds 7/42 either way — the old
    # threshold only passed on a lucky draw). A test-scale LR makes the
    # "train step optimizes" property seed-robust.
    c = dataclasses.replace(c)
    c.learning_rate = 1e-3
    tx = make_optimizer(c, params, total_steps=60)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, c, augment=False,
                           compute_contrastive_loss=False)
    losses = []
    for _ in range(30):
        state, parts = step(state, {k: batch[k] for k in
                                    ("text", "audio", "video", "emotion")})
        losses.append(float(parts["emotion_loss"]))
    assert all(np.isfinite(l) for l in losses)
    # overfits 4 samples: end loss clearly below start
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1


def test_backbone_lr_group(setup):
    c, model, batch, params = setup
    from simple_multimodal_tpu.train.optim import backbone_mask

    mask = backbone_mask(params)
    leaves = jax.tree_util.tree_leaves(mask)
    assert any(leaves) and not all(leaves)  # both groups non-empty


def test_frozen_teacher_not_updated(tiny_config):
    from simple_multimodal_tpu.models import KnowledgeDistillationModel

    c = dataclasses.replace(tiny_config)
    c.fusion_type = "early"
    model = KnowledgeDistillationModel(c, c)
    batch = make_batch(c, B=2, seed=5)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["text"], batch["audio"], batch["video"]
    )
    tx = make_optimizer(c, params, total_steps=10,
                        freeze_mask={"params": {"teacher": True}})
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, c, augment=False,
                           compute_contrastive_loss=False)
    # snapshot before stepping: the train step donates the state buffers
    teacher_before = [np.asarray(x) for x in
                      jax.tree_util.tree_leaves(state.params["params"]["teacher"])]
    student_before = [np.asarray(x) for x in
                      jax.tree_util.tree_leaves(state.params["params"]["student"])]
    state, parts = step(state, {k: batch[k] for k in
                                ("text", "audio", "video", "emotion")})
    teacher_after = jax.tree_util.tree_leaves(state.params["params"]["teacher"])
    for b, a in zip(teacher_before, teacher_after):
        np.testing.assert_array_equal(b, np.asarray(a))
    student_after = jax.tree_util.tree_leaves(state.params["params"]["student"])
    assert any(
        not np.array_equal(b, np.asarray(a))
        for b, a in zip(student_before, student_after)
    )
    assert float(parts["distillation_loss"]) >= 0


def test_checkpoint_roundtrip(setup, tmp_path):
    c, model, batch, params = setup
    tx = make_optimizer(c, params, total_steps=10)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))
    path = str(tmp_path / "ckpt" / "best_model")
    save_checkpoint(path, state, metrics={"val_f1_macro": 0.5}, epoch=3, config=c)

    restored = restore_params(path)
    eval_step = make_eval_step(model)
    out1 = eval_step(state.params, {k: batch[k] for k in
                                    ("text", "audio", "video", "emotion")})
    out2 = eval_step(restored, {k: batch[k] for k in
                                ("text", "audio", "video", "emotion")})
    np.testing.assert_allclose(
        np.asarray(out1["logits"]), np.asarray(out2["logits"]), atol=1e-6
    )
    full = restore_checkpoint(path)
    assert full["step"] == 0
    assert full["meta"]["epoch"] == 3
    assert full["meta"]["metrics"]["val_f1_macro"] == 0.5
    assert full["meta"]["config"]["fusion_hidden_size"] == c.fusion_hidden_size
    assert "opt_state" in full


def test_targeted_resume_restores_exact_structure(setup, tmp_path):
    c, model, batch, params = setup
    tx = make_optimizer(c, params, total_steps=10)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))
    step = make_train_step(model, tx, c, augment=False,
                           compute_contrastive_loss=False)
    state, _ = step(state, {k: batch[k] for k in
                            ("text", "audio", "video", "emotion")})
    path = str(tmp_path / "ckpt" / "resume")
    save_checkpoint(path, state, epoch=0, config=c)

    live = TrainState.create(jax.device_get(state.params), tx,
                             jax.random.PRNGKey(9))
    payload = restore_checkpoint(path, state_target=live)
    # exact pytree back (namedtuple types preserved, not sorted dicts)
    assert (jax.tree_util.tree_structure(payload["opt_state"])
            == jax.tree_util.tree_structure(live.opt_state))
    assert int(payload["step"]) == 1
    for a, b in zip(jax.tree_util.tree_leaves(payload["opt_state"]),
                    jax.tree_util.tree_leaves(jax.device_get(state.opt_state))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_resume_rejects_optimizer_change(setup, tmp_path):
    import optax

    c, model, batch, params = setup
    tx = make_optimizer(c, params, total_steps=10)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))
    path = str(tmp_path / "ckpt" / "guard")
    save_checkpoint(path, state, epoch=0, config=c)

    other = TrainState.create(jax.device_get(state.params), optax.sgd(1e-3),
                              jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="different optimizer"):
        restore_checkpoint(path, state_target=other)


def test_missing_modality_rate_step(setup):
    c, model, batch, params = setup
    tx = make_optimizer(c, params, total_steps=10)
    state = TrainState.create(params, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, tx, c, augment=False,
                           compute_contrastive_loss=False,
                           missing_modality_rate=0.3)
    state, parts = step(state, {k: batch[k] for k in
                                ("text", "audio", "video", "emotion")})
    assert np.isfinite(float(parts["total_loss"]))


class _ListLoader:
    """Minimal loader over fixed batches (no shuffle; deterministic)."""

    def __init__(self, batches, dataset=None):
        self.batches = batches
        self.dataset = dataset

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


def test_epoch_loss_is_mean_of_batches(tiny_config):
    """train_epoch reports the epoch MEAN of per-batch losses (the round-1
    implementation reported the last batch only)."""
    import dataclasses as dc

    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    c = dc.replace(tiny_config)
    c.fusion_type = "early"
    c.num_epochs = 1
    batches = [make_batch(c, B=2, seed=s) for s in range(3)]
    loader = _ListLoader(batches)
    trainer = AdvancedTrainer(
        model=create_model(c, "standard"), config=c,
        train_loader=loader, val_loader=_ListLoader(batches[:1]),
    )
    snapshot = TrainState(
        step=int(trainer.state.step),
        params=jax.device_get(trainer.state.params),
        opt_state=jax.device_get(trainer.state.opt_state),
        rng=np.asarray(jax.device_get(trainer.state.rng)),
    )
    reported = trainer.train_epoch()

    # replay the identical deterministic steps, collecting per-batch losses
    from simple_multimodal_tpu.train.steps import device_batch

    state = snapshot
    per_batch = []
    for b in batches:
        state, parts = trainer.train_step(state, device_batch(b))
        per_batch.append(float(jax.device_get(parts)["total_loss"]))
    assert reported["total_loss"] == pytest.approx(np.mean(per_batch), rel=1e-6)


def test_degenerate_run_still_writes_best_model(tiny_config, tmp_path):
    """A run whose val F1 never beats 0.0 must still produce
    ckpt/best_model (the README quickstart's step 3 reads it)."""
    import dataclasses as dc

    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    c = dc.replace(tiny_config, save_path=str(tmp_path / "ckpt"),
                   log_path=str(tmp_path / "logs"))
    c.fusion_type = "early"
    c.num_epochs = 1
    batches = [make_batch(c, B=2, seed=s) for s in range(2)]
    trainer = AdvancedTrainer(
        model=create_model(c, "standard"), config=c,
        train_loader=_ListLoader(batches),
        val_loader=_ListLoader(batches[:1]),
    )
    # force the degenerate path: validation always reports F1 = 0.0
    trainer.validate = lambda: ({"val_loss": 1.0, "val_accuracy": 0.0,
                                 "val_f1_macro": 0.0, "val_f1_weighted": 0.0},
                                {}, np.zeros(2, np.int64),
                                np.zeros(2, np.int64),
                                np.zeros((2, c.num_emotions), np.float32))
    trainer.train()
    assert (tmp_path / "ckpt" / "best_model").exists()
    from simple_multimodal_tpu.eval.evaluator import ModelEvaluator

    ev = ModelEvaluator(str(tmp_path / "ckpt" / "best_model"), config=c)
    assert ev.params is not None


def test_robust_avg_loss_is_mean(tiny_config):
    import dataclasses as dc

    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import RobustnessTrainer

    c = dc.replace(tiny_config)
    c.fusion_type = "early"
    c.num_epochs = 1
    batches = [make_batch(c, B=2, seed=s) for s in range(3)]
    trainer = RobustnessTrainer(
        model=create_model(c, "robust"), config=c,
        train_loader=_ListLoader(batches), val_loader=_ListLoader(batches[:1]),
    )
    snapshot = TrainState(
        step=int(trainer.state.step),
        params=jax.device_get(trainer.state.params),
        opt_state=jax.device_get(trainer.state.opt_state),
        rng=np.asarray(jax.device_get(trainer.state.rng)),
    )
    reported = trainer.train_with_missing_modalities()

    from simple_multimodal_tpu.train.steps import device_batch

    state, per_batch = snapshot, []
    for b in batches:
        state, parts = trainer.robust_train_step(state, device_batch(b))
        per_batch.append(float(jax.device_get(parts)["total_loss"]))
    assert reported["avg_loss"] == pytest.approx(np.mean(per_batch), rel=1e-6)


def test_train_step_with_fused_kernels_and_dropout(tiny_config):
    """The production TPU training path: flash forced ON so all three
    fused kernels (disentangled attention, attention block, FFN block)
    run with their in-kernel hash dropout active inside the real train
    step (interpret mode on CPU). Losses finite, params move, and the
    step is dropout-stochastic across steps (different per-step seeds)."""
    c = dataclasses.replace(tiny_config)
    c.fusion_type = "early"
    c.flash_attention = True
    c.learning_rate = 1e-3
    model = MultimodalEmotionModel(c)
    batch = make_batch(c, B=2, seed=11)
    # host copy: the train step donates the state, deleting the originals
    params = jax.device_get(jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["text"], batch["audio"], batch["video"]
    ))
    tx = make_optimizer(c, params, total_steps=10)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, c, augment=False,
                           compute_contrastive_loss=False)
    data = {k: batch[k] for k in ("text", "audio", "video", "emotion")}
    losses = []
    for _ in range(3):
        state, parts = step(state, dict(data))
        losses.append(float(parts["emotion_loss"]))
    assert all(np.isfinite(l) for l in losses)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        params, state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0



def test_legacy_per_layer_checkpoint_migrates_to_scan_layout():
    """Pre-scan checkpoints hold layer_0..layer_{N-1} subtrees; restore
    must stack them into the nn.scan 'layers' layout (checkpoint.py)."""
    from simple_multimodal_tpu.train.checkpoint import migrate_legacy_layers

    legacy = {
        "encoder": {
            "layer_0": {"dense": {"kernel": np.ones((2, 2)) * 0,
                                  "bias": np.zeros(2)}},
            "layer_1": {"dense": {"kernel": np.ones((2, 2)) * 1,
                                  "bias": np.ones(2)}},
            "layer_2": {"dense": {"kernel": np.ones((2, 2)) * 2,
                                  "bias": np.ones(2) * 2}},
            "emb": {"w": np.arange(4.0)},
        },
        "head": {"kernel": np.eye(2)},
    }
    out = migrate_legacy_layers(legacy)
    assert "layer_0" not in out["encoder"]
    stacked = out["encoder"]["layers"]["dense"]["kernel"]
    assert stacked.shape == (3, 2, 2)
    np.testing.assert_array_equal(stacked[2], np.ones((2, 2)) * 2)
    np.testing.assert_array_equal(out["encoder"]["emb"]["w"], np.arange(4.0))
    # incomplete pattern (gap) is left untouched
    gap = {"layer_0": {"w": np.zeros(1)}, "layer_2": {"w": np.zeros(1)}}
    assert "layers" not in migrate_legacy_layers(dict(gap))
