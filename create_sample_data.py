#!/usr/bin/env python
"""Sample data generator CLI (reference: /root/reference/create_sample_data.py:329-356).

Creates procedural per-emotion audio (WAV), video (MP4), texts, and
train/val/test CSVs in the schema the dataset loaders consume.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple_multimodal_tpu.data.sample_data import EMOTIONS, create_sample_dataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Create sample multimodal emotion dataset")
    parser.add_argument("--output_dir", type=str, default="data/sample",
                        help="Output directory for sample dataset")
    parser.add_argument("--num_samples", type=int, default=10,
                        help="Number of samples per emotion")
    parser.add_argument("--emotions", nargs="+", default=list(EMOTIONS),
                        help="List of emotions to generate")
    parser.add_argument("--duration", type=float, default=3.0,
                        help="Clip duration in seconds")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--difficulty", type=float, default=0.0,
                        help="0 (default, separable recipes) .. 1 (hard: "
                             "blended class recipes, cross-modal text "
                             "conflicts, 10%% label noise). Use ~1.0 for "
                             "convergence-regression runs so neither a "
                             "collapse NOR a suspicious 1.00 F1 passes.")
    args = parser.parse_args()

    np.random.seed(args.seed)
    path = create_sample_dataset(
        output_dir=args.output_dir,
        num_samples_per_emotion=args.num_samples,
        emotions=args.emotions,
        seed=args.seed,
        duration=args.duration,
        difficulty=args.difficulty,
    )
    print("Sample dataset ready!")
    print(f"Location: {path}")
    print("You can now test the system with:")
    print(f"python train_advanced.py --data_path {path} --epochs 5")


if __name__ == "__main__":
    main()
