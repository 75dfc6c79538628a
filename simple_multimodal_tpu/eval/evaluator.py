"""Model evaluator: batch inference → metrics → plots → HTML report → JSON.

Workflow parity with /root/reference/evaluate_model.py (ModelEvaluator):
``evaluate_dataset`` returns the same result schema (metrics dict,
individual per-modality metrics for late fusion, predictions/targets/
probabilities/features arrays); ``create_visualizations`` emits the 7 plot
families; ``generate_report`` writes the styled HTML report;
``save_detailed_results`` dumps detailed_results.json.

TPU redesign: inference runs through the jitted eval step with device
prefetch; features/probabilities sync to host once per batch.
"""
import json
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..config import ModelConfig, config_from_dict, load_config_json
from ..data.pipeline import prefetch_to_device
from ..models import MultimodalEmotionModel
from ..train.checkpoint import restore_checkpoint
from ..train.steps import device_batch, make_eval_step
from .metrics import calculate_metrics
from . import plots


class ModelEvaluator:
    """Loads a checkpoint (+optional config JSON) and evaluates datasets."""

    def __init__(self, model_path: str, config_path: Optional[str] = None,
                 config: Optional[ModelConfig] = None):
        if config is None:
            config = ModelConfig()
            payload_cfg = None
            if config_path:
                data = load_config_json(config_path)
                payload_cfg = data.get("model_config", data)
            else:
                meta = Path(model_path) / "meta.json"
                if meta.exists():
                    with open(meta) as f:
                        payload_cfg = json.load(f).get("config")
            if payload_cfg:
                config = config_from_dict(ModelConfig, payload_cfg)
        self.config = config

        if not Path(model_path).exists():
            hint = ""
            parent = Path(model_path).parent
            if parent.is_dir():
                finals = sorted(p.name for p in parent.iterdir()
                                if p.name.startswith(("final_model",
                                                      "checkpoint_")))
                if finals:
                    hint = (" Available checkpoints in "
                            f"{parent}: {', '.join(finals)}.")
            raise FileNotFoundError(
                f"No checkpoint at {model_path}.{hint} (A run whose val F1 "
                "never improves writes best_model only once per run — "
                "re-run training or point --model_path at a final_model_* "
                "directory.)")
        payload = restore_checkpoint(model_path)
        self.params = payload["params"]
        self.model = MultimodalEmotionModel(config)
        self.eval_step = make_eval_step(self.model)
        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree_util.tree_leaves(self.params))
        print(f"Model loaded: {n:,} parameters "
              f"(fusion={getattr(config, 'fusion_type', 'hierarchical')})")

    def evaluate_dataset(self, data_loader) -> Dict:
        all_predictions, all_targets, all_probabilities = [], [], []
        all_features, all_ids = [], []
        individual = {"text": [], "audio": [], "video": []}

        print("Running evaluation...")
        for batch in prefetch_to_device(data_loader, size=2):
            out = jax.device_get(
                self.eval_step(self.params, device_batch(batch))
            )
            all_predictions.extend(np.asarray(out["predictions"]).tolist())
            all_targets.extend(np.asarray(batch["emotion"]).tolist())
            all_probabilities.extend(np.asarray(out["probs"]).tolist())
            all_features.extend(np.asarray(out["features"]).tolist())
            all_ids.extend(batch["sample_ids"])
            if "individual_logits" in out:
                for modality, logits in out["individual_logits"].items():
                    individual[modality].extend(
                        np.argmax(np.asarray(logits), axis=-1).tolist()
                    )

        # drop wrap-padded duplicates: each dataset item counts exactly once
        from ..train.trainer import dedupe_by_sample_id

        keep_arrays = dedupe_by_sample_id(
            all_ids, all_predictions, all_targets, all_probabilities,
            all_features,
        )
        predictions, targets, probabilities, features = keep_arrays
        for modality in list(individual):
            if individual[modality]:
                individual[modality] = dedupe_by_sample_id(
                    all_ids, individual[modality])[0].tolist()
        features = features if len(features) else None

        metrics = calculate_metrics(targets, predictions, probabilities,
                                    self.config.emotion_labels)
        individual_metrics = {}
        from sklearn.metrics import accuracy_score, f1_score

        for modality, preds in individual.items():
            if preds:
                preds = np.array(preds)
                individual_metrics[modality] = {
                    "accuracy": float(accuracy_score(targets, preds)),
                    "f1_macro": float(f1_score(targets, preds, average="macro",
                                               zero_division=0)),
                    "f1_weighted": float(f1_score(
                        targets, preds, average="weighted", zero_division=0)),
                }
        return {
            "metrics": metrics,
            "individual_metrics": individual_metrics,
            "predictions": predictions,
            "targets": targets,
            "probabilities": probabilities,
            "features": features,
        }

    # ------------------------------------------------------------------ plots
    def create_visualizations(self, results: Dict, save_dir: str) -> None:
        save_path = Path(save_dir)
        save_path.mkdir(parents=True, exist_ok=True)
        labels = self.config.emotion_labels
        t, p, pr = (results["targets"], results["predictions"],
                    results["probabilities"])
        plots.plot_confusion_matrix(t, p, labels, save_path)
        plots.plot_per_class_performance(results["metrics"], labels, save_path)
        plots.plot_confidence_distribution(pr, t, p, save_path)
        plots.plot_roc_curves(t, pr, labels, save_path)
        if results["features"] is not None and len(results["features"]) > 5:
            try:
                plots.plot_feature_tsne(results["features"], t, labels, save_path)
            except Exception as e:  # t-SNE can fail on degenerate inputs
                print(f"t-SNE skipped: {e}")
        plots.plot_error_analysis(t, p, pr, labels, save_path)
        if results["individual_metrics"]:
            plots.plot_modality_comparison(results["individual_metrics"], save_path)
        print(f"Visualizations saved to: {save_path}")

    # ----------------------------------------------------------------- report
    def generate_report(self, results: Dict, save_dir: str) -> str:
        report_path = Path(save_dir) / "evaluation_report.html"
        m = results["metrics"]
        labels = self.config.emotion_labels

        def grade(v):
            return ("good", "Excellent") if v > 0.8 else (
                ("warning", "Good") if v > 0.6 else ("poor", "Needs Improvement"))

        acc_cls, acc_word = grade(m["accuracy"])
        rows = "\n".join(
            f"<tr><td>{labels[i]}</td>"
            f"<td>{m['per_class_f1'][i]:.4f}</td>"
            f"<td>{m['per_class_precision'][i]:.4f}</td>"
            f"<td>{m['per_class_recall'][i]:.4f}</td></tr>"
            for i in range(len(labels))
        )
        modality_rows = "\n".join(
            f"<tr><td>{mod.title()}</td><td>{im['accuracy']:.4f}</td>"
            f"<td>{im['f1_macro']:.4f}</td></tr>"
            for mod, im in results["individual_metrics"].items()
        )
        modality_section = (
            f"""<div class="section"><h2>🧩 Per-Modality Performance</h2>
            <table class="table"><tr><th>Modality</th><th>Accuracy</th>
            <th>F1 (Macro)</th></tr>{modality_rows}</table></div>"""
            if results["individual_metrics"] else ""
        )
        roc_div = (
            f'<div class="metric"><strong>ROC AUC:</strong> {m["roc_auc"]:.4f}</div>'
            if m["roc_auc"] else ""
        )
        cs = m["confidence_stats"]
        images = "\n".join(
            f'<div class="section"><h3>{name}</h3><img src="{fn}" width="90%"/></div>'
            for name, fn in [
                ("Confusion Matrices", "confusion_matrix.png"),
                ("Per-Class Performance", "per_class_performance.png"),
                ("Confidence Analysis", "confidence_analysis.png"),
                ("ROC Curves", "roc_curves.png"),
                ("Feature t-SNE", "feature_tsne.png"),
                ("Error Analysis", "error_analysis.png"),
                ("Modality Comparison", "modality_comparison.png"),
            ]
            if (Path(save_dir) / fn).exists()
        )
        html = f"""<!DOCTYPE html>
<html>
<head>
  <title>Multimodal Emotion Recognition - Evaluation Report</title>
  <style>
    body {{ font-family: Arial, sans-serif; margin: 40px; }}
    .header {{ background-color: #f0f0f0; padding: 20px; border-radius: 5px; }}
    .section {{ margin: 20px 0; }}
    .metric {{ background-color: #e8f4fd; padding: 10px; margin: 5px 0;
               border-radius: 3px; }}
    .table {{ border-collapse: collapse; width: 100%; }}
    .table th, .table td {{ border: 1px solid #ddd; padding: 8px;
                            text-align: left; }}
    .table th {{ background-color: #f2f2f2; }}
    .good {{ color: green; font-weight: bold; }}
    .warning {{ color: orange; font-weight: bold; }}
    .poor {{ color: red; font-weight: bold; }}
  </style>
</head>
<body>
  <div class="header">
    <h1>🎭 Multimodal Emotion Recognition Evaluation Report</h1>
    <p>Generated on: {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}</p>
    <p>Backend: TPU-native (JAX/XLA) · fusion =
       {getattr(self.config, 'fusion_type', 'hierarchical')}</p>
  </div>
  <div class="section">
    <h2>📊 Overall Performance</h2>
    <div class="metric"><strong>Accuracy:</strong> {m['accuracy']:.4f}
      <span class="{acc_cls}">({acc_word})</span></div>
    <div class="metric"><strong>F1-Score (Macro):</strong> {m['f1_macro']:.4f}</div>
    <div class="metric"><strong>F1-Score (Weighted):</strong> {m['f1_weighted']:.4f}</div>
    <div class="metric"><strong>Precision (Macro):</strong> {m['precision_macro']:.4f}</div>
    <div class="metric"><strong>Recall (Macro):</strong> {m['recall_macro']:.4f}</div>
    {roc_div}
  </div>
  <div class="section">
    <h2>🎯 Per-Class Performance</h2>
    <table class="table">
      <tr><th>Emotion</th><th>F1-Score</th><th>Precision</th><th>Recall</th></tr>
      {rows}
    </table>
  </div>
  <div class="section">
    <h2>🔍 Confidence Analysis</h2>
    <div class="metric"><strong>Mean Confidence:</strong>
      {cs['mean_confidence']:.4f} ± {cs['confidence_std']:.4f}</div>
    <div class="metric"><strong>Mean Confidence (Correct):</strong>
      {cs['mean_confidence_correct']:.4f}</div>
    <div class="metric"><strong>Mean Confidence (Incorrect):</strong>
      {cs['mean_confidence_incorrect']:.4f}</div>
  </div>
  {modality_section}
  {images}
</body>
</html>"""
        with open(report_path, "w") as f:
            f.write(html)
        print(f"Report saved to: {report_path}")
        return str(report_path)

    def save_detailed_results(self, results: Dict, save_dir: str) -> str:
        results_path = Path(save_dir) / "detailed_results.json"
        json_results = {
            "metrics": results["metrics"],
            "individual_metrics": results["individual_metrics"],
            "predictions": results["predictions"].tolist(),
            "targets": results["targets"].tolist(),
            "probabilities": results["probabilities"].tolist(),
        }
        with open(results_path, "w") as f:
            json.dump(json_results, f, indent=2)
        return str(results_path)
