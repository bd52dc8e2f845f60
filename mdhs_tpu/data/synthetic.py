"""Synthetic mini-dataset generator (on-disk) for e2e tests and benchmarks.

Generates the exact file layout the reference consumes (SURVEY.md §4):
an image dir of JPEGs, a responses.json with image_info/description
records, a label CSV with image/label columns, and an optional HAM-style
metadata CSV for the tabular branch. Images are class-conditional colored
noise so a model can actually overfit them in a few steps.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np
from PIL import Image

CLASS_WORDS = [
    "melanocytic nevus lesion",
    "melanoma irregular border",
    "benign keratosis plaque",
    "basal cell carcinoma pearly",
    "actinic keratosis rough",
    "vascular lesion red",
    "dermatofibroma firm nodule",
]


def generate_synthetic_dataset(
    root: str,
    num_images: int = 24,
    num_classes: int = 7,
    image_size: int = 64,
    seed: int = 0,
    with_metadata: bool = True,
    sequence_groups: bool = False,
):
    """Creates {root}/images, responses.json, labels.csv [, metadata.csv].

    Returns a dict of paths keyed like the reference config's data section.
    """
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    records, labels, meta_rows = [], [], []
    for i in range(num_images):
        label = int(i % num_classes)
        if sequence_groups:
            image_id = f"case{i // 5:03d}_{i % 5}.jpg"
        else:
            image_id = f"img_{i:04d}.jpg"
        base = rng.normal(loc=40 + 25 * label, scale=30, size=(image_size, image_size, 3))
        arr = np.clip(base, 0, 255).astype(np.uint8)
        # class-dependent structured blob so vision alone is informative
        cx = (label * 7 + 10) % (image_size - 12)
        arr[cx : cx + 10, cx : cx + 10, label % 3] = 255
        Image.fromarray(arr).save(os.path.join(img_dir, image_id), quality=92)

        words = CLASS_WORDS[label % len(CLASS_WORDS)]
        records.append(
            {"image_info": image_id, "description": f"the image shows a {words} case {i}"}
        )
        labels.append((image_id, label))
        meta_rows.append(
            {
                "image_id": os.path.splitext(image_id)[0],
                "age": int(rng.integers(20, 90)),
                "sex": ["male", "female"][int(rng.integers(2))],
                "localization": ["back", "face", "hand"][label % 3],
            }
        )

    json_path = os.path.join(root, "responses.json")
    with open(json_path, "w") as f:
        json.dump(records, f)
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_id", "label"])
        w.writerows(labels)
    paths = {
        "image_dir": img_dir,
        "json_path": json_path,
        "label_csv": csv_path,
    }
    if with_metadata:
        meta_path = os.path.join(root, "metadata.csv")
        with open(meta_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["image_id", "age", "sex", "localization"])
            w.writeheader()
            w.writerows(meta_rows)
        paths["metadata_csv"] = meta_path
    return paths


def synthetic_config(paths: dict, tmpdir: str, *, num_classes: int = 7,
                     batch_size: int = 4, num_epochs: int = 2,
                     hidden_dim: int = 32, max_length: int = 32) -> dict:
    """A minimal config dict in the reference YAML schema, pointing at the
    synthetic dataset and sized for CPU tests (tiny BERT, resnet18)."""
    return {
        "data": {
            "train_image_dir": paths["image_dir"],
            "train_json_path": paths["json_path"],
            "train_label_csv": paths["label_csv"],
            "val_image_dir": paths["image_dir"],
            "val_json_path": paths["json_path"],
            "val_label_csv": paths["label_csv"],
            "test_image_dir": paths["image_dir"],
            "test_json_path": paths["json_path"],
            "test_label_csv": paths["label_csv"],
            "metadata_csv": paths.get("metadata_csv"),
            "image_size": 64,
            "canvas": 72,
        },
        "model": {
            "num_classes": num_classes,
            "fusion_type": "concat",
            "classifier_type": "mlp",
            "image_encoder": {"backbone": "resnet18", "feature_dim": 512,
                              "pretrained": False, "freeze": False},
            "text_encoder": {"model_name": None, "feature_dim": 64, "freeze": False,
                             "preset": "tiny"},
            "mlp_head": {"hidden_dim": hidden_dim, "dropout": 0.1},
        },
        "training": {
            "batch_size": batch_size,
            "learning_rate": 1e-3,
            "num_epochs": num_epochs,
            "optimizer": "Adam",
            "lr_scheduler": None,
            "precision": "fp32",
        },
        "tokenizer": {"max_length": max_length},
        "output": {"log_dir": os.path.join(tmpdir, "runs"), "run_name": "test"},
    }
