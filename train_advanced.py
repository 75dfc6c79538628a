#!/usr/bin/env python
"""Advanced training CLI for the TPU-native multimodal emotion framework.

Flag-compatible with the reference CLI (/root/reference/train_advanced.py:392-420):
``--mode {standard,few_shot,distillation,robust,ablation,all}``,
``--fusion_type {early,late,mult,graph,contrastive,adaptive,hierarchical}``,
paths, batch size, epochs, learning rate, seed, wandb. TPU-native additions:
``--preset`` (encoder scale), ``--mesh d,m`` (device mesh), ``--bf16``.
"""
import argparse
import json
import os
import random
import sys
from pathlib import Path
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple_multimodal_tpu.config import (  # noqa: E402
    DataConfig, ExperimentConfig, ModelConfig, config_to_dict,
)


def set_seed(seed: int = 42) -> None:
    """Seed host RNGs; device RNG keys are threaded explicitly from the seed."""
    random.seed(seed)
    np.random.seed(seed)


def load_datasets(data_config: DataConfig, model_config: ModelConfig,
                  seed: int = 0) -> Dict:
    from simple_multimodal_tpu.data import create_dataloader, get_dataset

    print("Loading datasets...")
    loaders = {}
    counts = {}
    for split in ("train", "val", "test"):
        ds = get_dataset(
            dataset_name=data_config.primary_dataset,
            data_path=model_config.data_path,
            split=split,
            config=model_config,
            augment=data_config.augment_data if split == "train" else False,
        )
        loaders[split] = create_dataloader(
            ds, batch_size=model_config.batch_size,
            shuffle=(split == "train"), seed=seed,
        )
        counts[split] = len(ds)
    print(f"Train samples: {counts['train']}")
    print(f"Val samples: {counts['val']}")
    print(f"Test samples: {counts['test']}")
    return loaders


def train_standard_model(model_config: ModelConfig, data_config: DataConfig,
                         fusion_type: str = "hierarchical", seed: int = 0,
                         resume_from: str = None) -> str:
    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.checkpoint import save_checkpoint
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    print(f"=== Training Standard Model with {fusion_type} fusion ===")
    model_config.fusion_type = fusion_type
    loaders = load_datasets(data_config, model_config, seed)
    model = create_model(model_config, model_type="standard")
    trainer = AdvancedTrainer(
        model=model, config=model_config,
        train_loader=loaders["train"], val_loader=loaders["val"],
        test_loader=loaders["test"], seed=seed, resume_from=resume_from,
    )
    trainer.train()
    model_path = Path(model_config.save_path) / f"final_model_{fusion_type}"
    save_checkpoint(str(model_path), trainer.state, metrics={},
                    epoch=trainer.current_epoch, config=model_config)
    print(f"Model saved to: {model_path}")
    return str(model_path)


def train_few_shot_model(model_config: ModelConfig, data_config: DataConfig,
                         experiment_config: ExperimentConfig,
                         seed: int = 0, num_episodes: int = 100) -> Dict[str, float]:
    from simple_multimodal_tpu.data import FewShotDataset, create_dataloader, get_dataset
    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import FewShotTrainer

    print("=== Few-Shot Learning Experiments ===")
    results = {}
    train_dataset = get_dataset(data_config.primary_dataset,
                                model_config.data_path, "train", model_config)
    val_dataset = get_dataset(data_config.primary_dataset,
                              model_config.data_path, "val", model_config)

    # Prototype reshaping needs exactly n_shot per class: clamp each sweep
    # point to the scarcest class (the reference crashes on ragged classes,
    # multimodal_model.py:344).
    class_counts = {}
    for row in train_dataset.data:
        cid = train_dataset.emotion_to_id[row["emotion"]]
        class_counts[cid] = class_counts.get(cid, 0) + 1
    min_count = min(
        (class_counts.get(c, 0) for c in range(model_config.num_emotions)),
        default=0,
    )
    if min_count == 0:
        print("Few-shot skipped: some emotion class has no train samples")
        return results

    for n_shot in experiment_config.few_shot_samples:
        print(f"Training {n_shot}-shot model...")
        n_shot_eff = min(n_shot, min_count)
        few_shot_train = FewShotDataset(train_dataset, n_shot=n_shot_eff,
                                        n_way=model_config.num_emotions)
        few_shot_val = FewShotDataset(val_dataset, n_shot=n_shot_eff,
                                      n_way=model_config.num_emotions)
        # Shuffled loaders so every episode draws a fresh support ordering
        # and a DIFFERENT random query batch, matching the reference's
        # episodic protocol (advanced_trainer.py:533-534 over shuffled torch
        # loaders); the trainer re-sorts support by label for prototypes.
        support_loader = create_dataloader(
            few_shot_train, batch_size=len(few_shot_train), shuffle=True,
            seed=seed)
        query_loader = create_dataloader(
            few_shot_val, batch_size=min(16, max(len(few_shot_val), 1)),
            shuffle=True, seed=seed)
        model = create_model(model_config, model_type="few_shot")
        trainer = FewShotTrainer(
            model=model, config=model_config,
            support_loader=support_loader, query_loader=query_loader,
            n_way=model_config.num_emotions, n_shot=n_shot_eff, seed=seed,
        )
        total_loss = 0.0
        for episode in range(num_episodes):
            loss = trainer.train_few_shot_episode(
                n_way=model_config.num_emotions, n_shot=n_shot_eff)
            total_loss += loss
            if (episode + 1) % 20 == 0:
                print(f"Episode {episode + 1}/{num_episodes}, Loss: {loss:.4f}")
        avg = total_loss / num_episodes
        results[f"{n_shot}_shot"] = avg
        print(f"{n_shot}-shot average loss: {avg:.4f}")
    return results


def train_knowledge_distillation(model_config: ModelConfig,
                                 data_config: DataConfig,
                                 teacher_model_path: str, seed: int = 0) -> str:
    import jax

    from simple_multimodal_tpu.models import KnowledgeDistillationModel
    from simple_multimodal_tpu.train.checkpoint import save_params
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    from simple_multimodal_tpu.train.checkpoint import restore_checkpoint

    print("=== Knowledge Distillation Training ===")
    loaders = load_datasets(data_config, model_config, seed)

    teacher_ckpt = restore_checkpoint(teacher_model_path)
    teacher_params = teacher_ckpt["params"]
    # the teacher architecture comes from its own saved config
    meta_cfg = teacher_ckpt.get("meta", {}).get("config") or {}
    if meta_cfg.get("fusion_type"):
        model_config.fusion_type = meta_cfg["fusion_type"]

    from simple_multimodal_tpu.config import config_from_dict

    # Student: halved fusion stack (reference: train_advanced.py:249-252)
    student_config = config_from_dict(ModelConfig, config_to_dict(model_config))
    student_config.fusion_hidden_size = model_config.fusion_hidden_size // 2
    student_config.fusion_num_heads = max(model_config.fusion_num_heads // 2, 1)
    student_config.fusion_num_layers = max(model_config.fusion_num_layers // 2, 1)
    student_config.fusion_type = getattr(model_config, "fusion_type", "hierarchical")

    model = KnowledgeDistillationModel(model_config, student_config)
    trainer = AdvancedTrainer(
        model=model, config=student_config,
        train_loader=loaders["train"], val_loader=loaders["val"],
        test_loader=loaders["test"], model_type="distillation", seed=seed,
    )
    # Inject trained teacher weights into the frozen teacher subtree
    params = dict(trainer.state.params)
    inner = dict(params["params"])
    inner["teacher"] = teacher_params["params"] if "params" in teacher_params else teacher_params
    params["params"] = inner
    trainer.state = trainer.state.replace(params=jax.device_put(params))

    trainer.train()
    student_path = Path(model_config.save_path) / "distilled_student_model"
    save_params(str(student_path),
                {"params": trainer.state.params["params"]["student"]})
    print(f"Distilled model saved to: {student_path}")
    return str(student_path)


def train_robust_model(model_config: ModelConfig, data_config: DataConfig,
                       experiment_config: ExperimentConfig,
                       seed: int = 0) -> Dict[str, Dict[str, float]]:
    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.checkpoint import save_checkpoint
    from simple_multimodal_tpu.train.trainer import RobustnessTrainer

    print("=== Robustness Training ===")
    loaders = load_datasets(data_config, model_config, seed)
    robust_model = create_model(model_config, model_type="robust")
    trainer = RobustnessTrainer(
        model=robust_model, config=model_config,
        train_loader=loaders["train"], val_loader=loaders["val"],
        test_loader=loaders["test"], model_type="robust", seed=seed,
    )
    print("Training with random modality dropout...")
    for epoch in range(max(model_config.num_epochs // 2, 1)):
        trainer.current_epoch = epoch
        metrics = trainer.train_with_missing_modalities()
        print(f"Epoch {epoch + 1}, Loss: {metrics['avg_loss']:.4f}")

    print("Evaluating robustness...")
    results = trainer.evaluate_robustness()
    print("Robustness Results:")
    for scenario, m in results.items():
        print(f"{scenario}: Accuracy={m['accuracy']:.3f}, F1={m['f1_macro']:.3f}")
    robust_path = Path(model_config.save_path) / "robust_model"
    save_checkpoint(str(robust_path), trainer.state, metrics={},
                    epoch=trainer.current_epoch, config=model_config)
    return results


def run_ablation_studies(model_config: ModelConfig, data_config: DataConfig,
                         experiment_config: ExperimentConfig,
                         seed: int = 0) -> Dict[str, Dict[str, float]]:
    from simple_multimodal_tpu.models import create_model
    from simple_multimodal_tpu.train.trainer import AdvancedTrainer

    print("=== Ablation Studies ===")
    fusion_methods = []
    if experiment_config.enable_early_fusion:
        fusion_methods.append("early")
    if experiment_config.enable_late_fusion:
        fusion_methods.append("late")
    if experiment_config.enable_mult_fusion:
        fusion_methods.append("mult")
    if experiment_config.enable_graph_fusion:
        fusion_methods.append("graph")
    if experiment_config.enable_contrastive_learning:
        fusion_methods.append("contrastive")

    results = {}
    for fusion_type in fusion_methods:
        print(f"Testing {fusion_type} fusion...")
        from simple_multimodal_tpu.config import config_from_dict

        temp = config_from_dict(ModelConfig, config_to_dict(model_config))
        temp.fusion_type = fusion_type
        temp.num_epochs = min(10, model_config.num_epochs)
        loaders = load_datasets(data_config, temp, seed)
        model = create_model(temp, model_type="standard")
        trainer = AdvancedTrainer(
            model=model, config=temp,
            train_loader=loaders["train"], val_loader=loaders["val"],
            test_loader=loaders["test"], seed=seed,
        )
        trainer.train()
        results[fusion_type] = {
            "val_accuracy": trainer.best_val_acc,
            "val_f1": trainer.best_val_f1,
        }
        print(f"{fusion_type} - Val Acc: {trainer.best_val_acc:.3f}, "
              f"Val F1: {trainer.best_val_f1:.3f}")
    return results


def main():
    parser = argparse.ArgumentParser(
        description="Advanced Multimodal Emotion Recognition Training (TPU)")
    parser.add_argument("--mode", type=str, default="standard",
                        choices=["standard", "few_shot", "distillation",
                                 "robust", "ablation", "all"],
                        help="Training mode")
    parser.add_argument("--fusion_type", type=str, default="hierarchical",
                        choices=["early", "late", "mult", "graph",
                                 "contrastive", "adaptive", "hierarchical"],
                        help="Fusion strategy")
    parser.add_argument("--data_path", type=str, default="./data")
    parser.add_argument("--save_path", type=str, default="./checkpoints")
    parser.add_argument("--teacher_model", type=str,
                        help="Teacher model path for distillation")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--device", type=str, default="auto",
                        help="auto, cpu, tpu")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str, default="multimodal-emotion")
    # TPU-native extensions
    parser.add_argument("--preset", type=str, default="base",
                        choices=["tiny", "half", "base"],
                        help="Encoder backbone scale")
    parser.add_argument("--mesh", type=str, default="1,1",
                        help="Device mesh 'data,model' (e.g. '8,1')")
    parser.add_argument("--episodes", type=int, default=100,
                        help="Few-shot episodes per n_shot")
    parser.add_argument("--few_shot_samples", type=int, nargs="+", default=None,
                        help="Override the n_shot sweep (default 1 5 10 20 50)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint directory to resume training from "
                             "(full state: params + optimizer + step)")
    parser.add_argument("--dataset", type=str, default=None,
                        help="Override primary dataset name")
    parser.add_argument("--flash_attention", type=str, default="auto",
                        help="Fused Pallas kernel engagement: auto/true/false")
    parser.add_argument("--flash_attention_train", type=str, default="auto",
                        help="Kernel engagement inside the TRAIN step "
                             "(auto = measured per-backend default; "
                             "see ops/attention.py)")
    parser.add_argument("--remat", type=str, default="auto",
                        choices=["auto", "0", "1"],
                        help="Gradient-checkpoint (remat) the encoder stacks: "
                             "auto (default; off when the saved activations "
                             "fit HBM — measured faster steps — on when they "
                             "would OOM) / 1 force-on (lowest memory) / "
                             "0 force-off")
    args = parser.parse_args()

    set_seed(args.seed)
    if args.device and args.device != "auto":
        os.environ.setdefault("JAX_PLATFORMS", args.device)
        import jax

        try:
            jax.config.update("jax_platforms", args.device)
        except Exception:
            pass

    model_config = ModelConfig()
    model_config.data_path = args.data_path
    model_config.save_path = args.save_path
    model_config.batch_size = args.batch_size
    model_config.num_epochs = args.epochs
    model_config.learning_rate = args.learning_rate
    model_config.device = args.device
    model_config.use_wandb = args.use_wandb
    model_config.fusion_type = args.fusion_type
    model_config.encoder_preset = args.preset
    model_config.mesh_shape = tuple(int(x) for x in args.mesh.split(","))
    model_config.flash_attention = args.flash_attention
    model_config.flash_attention_train = args.flash_attention_train
    model_config.remat_encoders = ("auto" if args.remat == "auto"
                                   else args.remat == "1")

    data_config = DataConfig()
    if args.dataset:
        data_config.primary_dataset = args.dataset
    experiment_config = ExperimentConfig()
    if args.few_shot_samples:
        experiment_config.few_shot_samples = args.few_shot_samples

    os.makedirs(args.save_path, exist_ok=True)

    if args.mode == "standard":
        path = train_standard_model(model_config, data_config,
                                    args.fusion_type, args.seed,
                                    resume_from=args.resume)
        print(f"Training completed! Model saved to: {path}")
    elif args.mode == "few_shot":
        results = train_few_shot_model(model_config, data_config,
                                       experiment_config, args.seed,
                                       args.episodes)
        print(f"Few-shot learning results: {results}")
    elif args.mode == "distillation":
        if not args.teacher_model:
            print("Error: Teacher model path required for distillation")
            return
        path = train_knowledge_distillation(model_config, data_config,
                                            args.teacher_model, args.seed)
        print(f"Distillation completed! Student model saved to: {path}")
    elif args.mode == "robust":
        results = train_robust_model(model_config, data_config,
                                     experiment_config, args.seed)
        print(f"Robustness training completed! Results: {results}")
    elif args.mode == "ablation":
        results = run_ablation_studies(model_config, data_config,
                                       experiment_config, args.seed)
        print(f"Ablation studies completed! Results: {results}")
    elif args.mode == "all":
        print("Running comprehensive experiments...")
        for fusion_type in ["early", "late", "mult", "graph", "contrastive",
                            "hierarchical"]:
            try:
                train_standard_model(model_config, data_config, fusion_type,
                                     args.seed)
                print(f"Completed {fusion_type} fusion training")
            except Exception as e:  # per-experiment isolation (reference :484-509)
                print(f"Error in {fusion_type} fusion: {e}")
        try:
            r = train_few_shot_model(model_config, data_config,
                                     experiment_config, args.seed, args.episodes)
            print(f"Few-shot results: {r}")
        except Exception as e:
            print(f"Error in few-shot learning: {e}")
        try:
            r = train_robust_model(model_config, data_config, experiment_config,
                                   args.seed)
            print(f"Robustness results: {r}")
        except Exception as e:
            print(f"Error in robustness training: {e}")
        try:
            r = run_ablation_studies(model_config, data_config,
                                     experiment_config, args.seed)
            print(f"Ablation results: {r}")
        except Exception as e:
            print(f"Error in ablation studies: {e}")

    config_save_path = Path(args.save_path) / "final_config.json"
    with open(config_save_path, "w") as f:
        json.dump({
            "model_config": config_to_dict(model_config),
            "data_config": config_to_dict(data_config),
            "experiment_config": config_to_dict(experiment_config),
        }, f, indent=2)
    print(f"Configuration saved to: {config_save_path}")


if __name__ == "__main__":
    main()
