#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint to this framework's format.

Accepts the reference's checkpoint layouts (raw ``state_dict`` or
``{'model_state_dict': ...}`` wrapping, /root/reference/models/
multimodal_model.py:478-483) and writes an Orbax params checkpoint that
``load_pretrained_model`` / ``evaluate_model.py`` / ``demo/serve.py`` load
directly.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="Convert reference torch checkpoint → TPU framework")
    parser.add_argument("--torch_checkpoint", required=True,
                        help=".pth file from the reference implementation, "
                             "or a .safetensors export of its state_dict "
                             "(loaded torch-free)")
    parser.add_argument("--output", required=True,
                        help="Output Orbax checkpoint directory")
    parser.add_argument("--fusion_type", default="hierarchical",
                        choices=["early", "late", "mult", "graph",
                                 "contrastive", "adaptive", "hierarchical"])
    parser.add_argument("--preset", default="base",
                        choices=["tiny", "half", "base"])
    args = parser.parse_args()

    from simple_multimodal_tpu.config import ModelConfig
    from simple_multimodal_tpu.models.convert_full import convert_multimodal_model
    from simple_multimodal_tpu.train.checkpoint import save_params

    if args.torch_checkpoint.endswith(".safetensors"):
        # torch-free: a state_dict exported with safetensors.torch.save_file
        from simple_multimodal_tpu.models.safetensors_io import (
            load_safetensors,
        )

        sd = load_safetensors(args.torch_checkpoint)
    else:
        import torch

        ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        sd = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}

    config = ModelConfig(encoder_preset=args.preset)
    config.fusion_type = args.fusion_type
    params = {"params": convert_multimodal_model(sd, config)}
    save_params(args.output, params)
    print(f"Converted checkpoint written to: {args.output}")


if __name__ == "__main__":
    main()
