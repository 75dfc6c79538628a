"""Evaluator metric schema and serving-logic tests."""
import numpy as np
import pytest

from simple_multimodal_tpu.eval.metrics import calculate_metrics
from simple_multimodal_tpu.serving.demo import (
    EmotionAwareResponseGenerator,
    activity_suggestions,
)

LABELS = ["happy", "sad", "angry", "fear", "surprise", "disgust", "neutral"]


def test_metrics_schema():
    rng = np.random.default_rng(0)
    n = 60
    targets = rng.integers(0, 7, n)
    probs = rng.dirichlet(np.ones(7), n)
    preds = probs.argmax(1)
    m = calculate_metrics(targets, preds, probs, LABELS)
    expected = {
        "accuracy", "f1_macro", "f1_weighted", "f1_micro", "precision_macro",
        "precision_weighted", "recall_macro", "recall_weighted", "roc_auc",
        "per_class_f1", "per_class_precision", "per_class_recall",
        "classification_report", "confidence_stats",
    }
    assert expected == set(m.keys())
    assert len(m["per_class_f1"]) == 7
    assert 0 <= m["accuracy"] <= 1
    cs = m["confidence_stats"]
    assert set(cs) == {"mean_confidence", "mean_confidence_correct",
                       "mean_confidence_incorrect", "confidence_std"}
    # a perfect classifier
    perfect = calculate_metrics(targets, targets,
                                np.eye(7)[targets], LABELS)
    assert perfect["accuracy"] == 1.0
    assert perfect["f1_macro"] == pytest.approx(1.0)
    assert perfect["roc_auc"] == pytest.approx(1.0)


def test_metrics_json_serializable():
    import json

    targets = np.array([0, 1, 2, 3])
    probs = np.eye(7)[targets]
    m = calculate_metrics(targets, targets, probs, LABELS)
    json.dumps(m)  # must not raise


def test_response_generator_contexts():
    gen = EmotionAwareResponseGenerator(seed=0)
    r = gen.generate_response("my boss at work is awful", "angry", 0.9, {})
    assert "Work situations" in r
    r = gen.generate_response("my sibling visited", "happy", 0.9, {})
    assert "Family relationships" in r
    r = gen.generate_response("failed my exam", "sad", 0.9, {})
    assert "Academic pressure" in r
    r = gen.generate_response("nothing in particular", "neutral", 0.9, {})
    assert "ups and downs" in r
    # low confidence adds the uncertainty follow-up
    r = gen.generate_response("hello", "happy", 0.3, {})
    assert "how are you really feeling" in r.lower()


def test_response_templates_cover_all_emotions():
    gen = EmotionAwareResponseGenerator(seed=1)
    for emotion in LABELS:
        r = gen.generate_response("test input", emotion, 0.9, {})
        assert isinstance(r, str) and len(r) > 20


def test_activity_suggestions_tiers():
    high = activity_suggestions("happy", 0.9)
    mid = activity_suggestions("happy", 0.7)
    low = activity_suggestions("happy", 0.4)
    assert "quite confident" in high
    assert "I think" in mid
    assert "not entirely sure" in low
    # top-3 suggestions shown
    assert len([l for l in high.splitlines() if l.strip()]) >= 4
    for emotion in LABELS:
        assert "suggestions" in activity_suggestions(emotion, 0.9)


def test_profiling_tools(tmp_path):
    import jax
    import jax.numpy as jnp

    from simple_multimodal_tpu.utils.profiling import StepTimer, memory_stats, trace

    timer = StepTimer(window=10)
    for _ in range(5):
        timer.tick()
    s = timer.summary()
    assert s["steps"] == 4 and s["mean_s"] >= 0

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    with trace(str(tmp_path / "tr")):
        float(f(x))
    # a trace directory with at least one artifact was produced
    produced = list((tmp_path / "tr").rglob("*"))
    assert produced, "no trace artifacts written"
    memory_stats()  # must not raise
