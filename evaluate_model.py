#!/usr/bin/env python
"""Evaluation CLI (reference: /root/reference/evaluate_model.py:750-843).

Loads a checkpoint, evaluates a dataset split, prints the summary metrics,
writes the 7 visualization families, the HTML report, and
detailed_results.json.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(
        description="Evaluate Multimodal Emotion Recognition Model")
    parser.add_argument("--model_path", type=str, required=True,
                        help="Path to trained model checkpoint directory")
    parser.add_argument("--config_path", type=str,
                        help="Path to model configuration JSON")
    parser.add_argument("--data_path", type=str, default="./data")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--output_dir", type=str, default="./evaluation_results")
    parser.add_argument("--dataset", type=str, default="cmu_mosei",
                        choices=["cmu_mosei", "meld", "iemocap", "multimodal",
                                 "sample"])
    parser.add_argument("--preset", type=str, default=None,
                        choices=["tiny", "half", "base"],
                        help="Override encoder preset (else from saved config)")
    parser.add_argument("--device", type=str, default="auto")
    parser.add_argument("--assert_f1_band", type=str, default=None,
                        metavar="LO,HI",
                        help="Exit non-zero unless LO <= F1-macro <= HI. "
                             "Regression tripwire for the e2e drive: on the "
                             "--difficulty sample set both a collapsed score "
                             "AND a suspiciously perfect one fail the band")
    args = parser.parse_args()
    band = None
    if args.assert_f1_band:
        try:
            lo, hi = (float(x) for x in args.assert_f1_band.split(","))
        except ValueError:
            parser.error("--assert_f1_band expects LO,HI (e.g. 0.5,0.98)")
        if not 0.0 <= lo <= hi <= 1.0:
            parser.error("--assert_f1_band needs 0 <= LO <= HI <= 1")
        band = (lo, hi)

    if args.device and args.device != "auto":
        import jax

        try:
            jax.config.update("jax_platforms", args.device)
        except Exception:
            pass

    from simple_multimodal_tpu.data import create_dataloader, get_dataset
    from simple_multimodal_tpu.eval.evaluator import ModelEvaluator

    evaluator = ModelEvaluator(args.model_path, args.config_path)
    if args.preset:
        evaluator.config.encoder_preset = args.preset
    evaluator.config.data_path = args.data_path

    print(f"Loading {args.dataset} dataset ({args.split} split)...")
    dataset = get_dataset(
        dataset_name=args.dataset, data_path=args.data_path,
        split=args.split, config=evaluator.config, augment=False,
    )
    data_loader = create_dataloader(dataset, batch_size=args.batch_size,
                                    shuffle=False)
    print(f"Evaluating on {len(dataset)} samples...")

    results = evaluator.evaluate_dataset(data_loader)

    print("\n" + "=" * 50)
    print("EVALUATION RESULTS")
    print("=" * 50)
    m = results["metrics"]
    print(f"Accuracy: {m['accuracy']:.4f}")
    print(f"F1-Score (Macro): {m['f1_macro']:.4f}")
    print(f"F1-Score (Weighted): {m['f1_weighted']:.4f}")
    print(f"Precision (Macro): {m['precision_macro']:.4f}")
    print(f"Recall (Macro): {m['recall_macro']:.4f}")
    if m["roc_auc"]:
        print(f"ROC AUC: {m['roc_auc']:.4f}")
    if results["individual_metrics"]:
        print("\nIndividual Modality Performance:")
        for modality, im in results["individual_metrics"].items():
            print(f"  {modality.title()}: Acc={im['accuracy']:.3f}, "
                  f"F1={im['f1_macro']:.3f}")

    output_path = Path(args.output_dir)
    output_path.mkdir(parents=True, exist_ok=True)
    evaluator.create_visualizations(results, args.output_dir)
    evaluator.generate_report(results, args.output_dir)
    results_path = evaluator.save_detailed_results(results, args.output_dir)
    print(f"\nDetailed results saved to: {results_path}")
    print(f"All evaluation outputs saved to: {output_path}")
    if band is not None:
        lo, hi = band
        f1 = m["f1_macro"]
        if not lo <= f1 <= hi:
            print(f"F1 BAND VIOLATION: f1_macro={f1:.4f} outside "
                  f"[{lo}, {hi}]", file=sys.stderr)
            sys.exit(3)
        print(f"F1 band OK: {f1:.4f} in [{lo}, {hi}]")


if __name__ == "__main__":
    main()
