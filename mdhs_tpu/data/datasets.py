"""Host-side dataset join logic (image dir + JSON descriptions + label CSV).

Parity with reference data_loader.py:102-315 and mibf_net/dataset_spine.py:
- JSON records keyed by image_info/image_name/image_path basenames; text
  from description/response/caption (data_loader.py:147-162)
- label CSV with auto-detected *image* / *label* columns (:165-170)
- missing descriptions degrade to empty text with a counter (:174-190)
- modes: single image, multi_view (N augmented views), sequence (neighbor
  slices by filename index offset), pseudo-2.5D (3 grayscale neighbors
  stacked as RGB) (:211-290)
- per-sample error tolerance: failed image loads produce a zero image
  (:287-290)
- tabular map from metadata CSV: z-scored numerics + one-hot categoricals
  with an "unknown" bucket (:37-100)
- Spine CSV-driven variant incl. CJK stripping (dataset_spine.py:14-99)

The dataset yields numpy records; device-side augmentation happens in
mdhs_tpu.ops (images leave the host as uint8 canvases).
"""

from __future__ import annotations

import csv
import json
import logging
import os
import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
from PIL import Image

log = logging.getLogger(__name__)

CANVAS = 256  # host canvas: shortest side resized to 256, center-cropped square
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def build_description_map(json_path: str) -> dict[str, str]:
    with open(json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    out = {}
    for item in data:
        key = None
        for k in ("image_info", "image_name", "image_path"):
            if k in item:
                key = os.path.basename(str(item[k]))
                break
        if not key:
            continue
        desc = item.get("description") or item.get("response") or item.get("caption")
        if desc is None:
            continue
        out[key] = desc
    return out


def load_label_map(csv_path: str) -> dict[str, int]:
    with open(csv_path, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        cols = reader.fieldnames or []
        image_col = next(c for c in cols if "image" in c)
        label_col = next(c for c in cols if "label" in c)
        return {row[image_col]: int(row[label_col]) for row in reader}


def clean_cjk(text: str) -> str:
    """Strip CJK characters (reference dataset_spine.py:33-34)."""
    return re.sub(r"[一-鿿　-〿＀-￯]", "", text or "").strip()


def neighbor_name(image_id: str, offset: int, pad: bool = False) -> str:
    """Neighbor slice filename by numeric index offset.

    Reference semantics (data_loader.py:211-223): shift the trailing number
    before the extension, clamped at 0. (The reference's regex is written
    with doubled backslashes and never matches; we implement the documented
    intent.) The reference formats the shifted index as a plain int, which
    drops zero padding ('slice_007.png' + 1 -> 'slice_8.png'); pad=True
    preserves the original digit width instead — the dataset tries the
    reference-intent name first and the padded form as a fallback before
    degrading to the center slice.
    """
    if offset == 0:
        return image_id
    m = re.match(r"^(.*_)(\d+)(\.[^.]+)$", image_id) or re.match(
        r"^(.*?)(\d+)(\.[^.]+)$", image_id
    )
    if not m:
        return image_id
    prefix, idx_str, suffix = m.groups()
    idx = max(0, int(idx_str) + offset)
    if pad:
        return f"{prefix}{idx:0{len(idx_str)}d}{suffix}"
    return f"{prefix}{idx}{suffix}"


def _resize_center_square(img: Image.Image, size: int = CANVAS) -> Image.Image:
    """PIL bilinear: shortest side -> size, then center crop size x size
    (matches torchvision Resize(256)+CenterCrop composition regions)."""
    w, h = img.size
    if w <= h:
        nw, nh = size, max(size, int(round(h * size / w)))
    else:
        nh, nw = size, max(size, int(round(w * size / h)))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - size) // 2
    top = (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


def _canvas_array(img: Image.Image, size: int) -> np.ndarray:
    """uint8 canvas via the native C++ resampler when available
    (mdhs_tpu.native, triangle filter == PIL BILINEAR), PIL otherwise."""
    from .. import native

    if native.available():
        out = native.resize_center_square(np.asarray(img, np.uint8), size)
        if out is not None:
            return out
    return np.asarray(_resize_center_square(img, size), np.uint8)


def build_tabular_map(metadata_csv: str, fields, normalize: str = "zscore"):
    """z-score numerics, one-hot categoricals with "unknown" bucket
    (reference data_loader.py:37-100). Returns (map: base_id -> vec, dim)."""
    import pandas as pd

    df = pd.read_csv(metadata_csv)
    df["image_id"] = df["image_id"].astype(str)
    df["image_id_base"] = df["image_id"].apply(lambda x: os.path.splitext(x)[0])

    numeric_fields, categorical_fields = [], []
    for f_ in fields:
        if f_ not in df.columns:
            continue
        if f_ == "age" or pd.api.types.is_numeric_dtype(df[f_]):
            numeric_fields.append(f_)
        else:
            categorical_fields.append(f_)

    numeric_stats = {}
    for f_ in numeric_fields:
        vals = pd.to_numeric(df[f_], errors="coerce")
        mean = float(vals.mean()) if vals.notna().any() else 0.0
        std = float(vals.std()) if vals.notna().any() else 1.0
        numeric_stats[f_] = (mean, std if std != 0.0 else 1.0)

    category_maps = {}
    for f_ in categorical_fields:
        vals = sorted(set(df[f_].dropna().astype(str)))
        if "unknown" not in vals:
            vals.append("unknown")
        category_maps[f_] = vals

    dim = len(numeric_fields) + sum(len(v) for v in category_maps.values())
    # column-vectorized assembly (the per-row/per-cell python loop cost
    # seconds per Trainer construction on HAM10k-scale CSVs)
    n = len(df)
    blocks = []
    for f_ in numeric_fields:
        vals = pd.to_numeric(df[f_], errors="coerce")
        mean, std = numeric_stats[f_]
        vals = vals.fillna(mean).to_numpy(np.float64)
        col = (vals - mean) / std if normalize == "zscore" else vals
        blocks.append(col.reshape(n, 1))
    for f_ in categorical_fields:
        cats = category_maps[f_]
        cat_idx = {c: i for i, c in enumerate(cats)}
        unk = cat_idx["unknown"]
        raw = df[f_]
        idx = np.asarray(
            [unk if pd.isna(v) else cat_idx.get(str(v), unk) for v in raw],
            np.intp,
        )
        blocks.append(np.eye(len(cats), dtype=np.float64)[idx])
    mat = (
        np.concatenate(blocks, axis=1).astype(np.float32)
        if blocks
        else np.zeros((n, 0), np.float32)
    )
    table = dict(zip(df["image_id_base"].tolist(), mat))
    return table, dim


@dataclass
class DatasetOptions:
    max_length: int = 128
    tabular_enabled: bool = False
    tabular_fields: tuple = ("age", "sex", "localization")
    tabular_normalize: str = "zscore"
    metadata_csv: Optional[str] = None
    extra_image_dirs: tuple = ()
    pseudo_2p5d: bool = False
    pseudo_offsets: tuple = (-1, 0, 1)
    sequence: bool = False
    sequence_offsets: tuple = (-2, -1, 0, 1, 2)
    multi_view: bool = False
    num_views: int = 2
    clean_cjk_text: bool = False
    canvas: int = CANVAS
    # optional precomputed LLM hidden-state vectors per image
    # (reference ConNexT/dataset/pl_datset.py:94-158, dims 3584/5120, zero-fill)
    llm_hidden_json: Optional[str] = None
    llm_hidden_dim: int = 3584
    # in-memory uint8 canvas cache: decode/resize each image once, reuse
    # across epochs (augmentation happens on device, so the canvas is
    # epoch-invariant; a 10k-image dataset costs ~2 GB host RAM)
    cache: bool = True
    # strict torchvision-parity augmentation on the host (data/augment_host.py);
    # when set, images leave the dataset already augmented at image_size
    host_augment: bool = False
    image_size: int = 224
    aug_degrees: float = 45.0
    aug_vflip: bool = True
    aug_jitter: bool = True
    seed: int = 0


class MultimodalDataset:
    """Joined records + uint8 canvas image loading. Indexable, numpy-native."""

    def __init__(self, image_dir: str, json_path: Optional[str], csv_path: Optional[str],
                 tokenizer, options: DatasetOptions | None = None):
        self.opts = options or DatasetOptions()
        self.image_dirs = [image_dir, *self.opts.extra_image_dirs]
        self.tokenizer = tokenizer
        self._canvas_cache: dict = {}
        import random as _random

        self._aug_rng = _random.Random(self.opts.seed)

        desc_map = build_description_map(json_path) if json_path else {}
        if csv_path:
            label_map = load_label_map(csv_path)
        else:
            # unlabeled predict mode: every image in the dir
            exts = (".jpg", ".jpeg", ".png", ".bmp")
            label_map = {
                f: -1 for f in sorted(os.listdir(image_dir)) if f.lower().endswith(exts)
            }

        self.metadata = []
        missing = 0
        for image_id, label in label_map.items():
            desc = desc_map.get(image_id, "")
            if not desc:
                missing += 1
            if self.opts.clean_cjk_text:
                desc = clean_cjk(desc)
            self.metadata.append({"image_id": image_id, "description": desc, "label": int(label)})
        log.info("loaded %d records (%d without description)", len(self.metadata), missing)
        if not self.metadata:
            raise ValueError("dataset join produced no records; check paths")

        self.llm_hidden_map = None
        if self.opts.llm_hidden_json:
            with open(self.opts.llm_hidden_json, "r", encoding="utf-8") as f:
                raw = json.load(f)
            self.llm_hidden_map = {}
            for key, val in raw.items():
                base = os.path.splitext(os.path.basename(key))[0]
                first = np.asarray(val.get("first_hidden_state", []), np.float32)
                last = np.asarray(val.get("last_hidden_state", []), np.float32)
                self.llm_hidden_map[base] = (first, last)

        self.tabular_map, self.tabular_dim = (None, 0)
        if self.opts.tabular_enabled:
            if not self.opts.metadata_csv:
                raise ValueError("tabular_enabled requires metadata_csv")
            self.tabular_map, self.tabular_dim = build_tabular_map(
                self.opts.metadata_csv, list(self.opts.tabular_fields), self.opts.tabular_normalize
            )

    def __len__(self):
        return len(self.metadata)

    @property
    def labels(self):
        return [m["label"] for m in self.metadata]

    def _find_image(self, image_id: str) -> Optional[str]:
        for d in self.image_dirs:
            p = os.path.join(d, image_id)
            if os.path.exists(p):
                return p
        return None

    def _neighbor(self, image_id: str, offset: int) -> str:
        """Resolve a neighbor-slice id: reference-intent name, then the
        zero-padding-preserving form, then the center slice (the reference
        falls back to the center image when a neighbor is missing,
        data_loader.py:230-232)."""
        nid = neighbor_name(image_id, offset)
        if self._find_image(nid) is not None:
            return nid
        padded = neighbor_name(image_id, offset, pad=True)
        if self._find_image(padded) is not None:
            return padded
        return image_id

    def _load_augmented(self, image_id: str, mode: str = "RGB") -> np.ndarray:
        """Host-augmented image at image_size (torchvision-exact path)."""
        from .augment_host import host_train_transform

        path = self._find_image(image_id)
        if path is None:
            raise FileNotFoundError(image_id)
        img = Image.open(path).convert("RGB")
        arr = host_train_transform(
            img, self.opts.image_size, self._aug_rng,
            degrees=self.opts.aug_degrees, vflip=self.opts.aug_vflip,
            jitter=self.opts.aug_jitter,
        )
        if mode == "L":
            return np.asarray(
                Image.fromarray(arr).convert("L"), np.uint8
            )
        return arr

    def _load_canvas(self, image_id: str, mode: str = "RGB") -> np.ndarray:
        if self.opts.host_augment:
            return self._load_augmented(image_id, mode)
        key = (image_id, mode)
        if self.opts.cache and key in self._canvas_cache:
            return self._canvas_cache[key]
        path = self._find_image(image_id)
        if path is None:
            raise FileNotFoundError(image_id)
        img = Image.open(path).convert(mode)
        arr = _canvas_array(img, self.opts.canvas)  # (S, S[, 3])
        if self.opts.cache:
            self._canvas_cache[key] = arr
        return arr

    def __getitem__(self, idx: int) -> dict:
        item = self.metadata[idx]
        image_id = item["image_id"]
        o = self.opts
        S = o.image_size if o.host_augment else o.canvas
        try:
            if o.multi_view:
                if o.host_augment:
                    # each view independently augmented (reference
                    # data_loader.py:270-276 applies the transform per view)
                    views = [self._load_augmented(image_id) for _ in range(o.num_views)]
                    image = np.stack(views, axis=0)
                else:
                    base = self._load_canvas(image_id)
                    image = np.stack([base] * o.num_views, axis=0)  # views aug'd on device
            elif o.sequence:
                slices = []
                for off in o.sequence_offsets:
                    slices.append(self._load_canvas(self._neighbor(image_id, off)))
                image = np.stack(slices, axis=0)  # (T, S, S, 3)
            elif o.pseudo_2p5d:
                slices = []
                for off in o.pseudo_offsets:
                    slices.append(
                        self._load_canvas(self._neighbor(image_id, off), mode="L")
                    )
                image = np.stack(slices, axis=2)  # (S, S, 3) grayscale stack as RGB
            else:
                image = self._load_canvas(image_id)
        except Exception as exc:  # reference: zero image on failure
            log.warning("image load failed for %s: %s", image_id, exc)
            if o.multi_view:
                image = np.zeros((o.num_views, S, S, 3), np.uint8)
            elif o.sequence:
                image = np.zeros((len(o.sequence_offsets), S, S, 3), np.uint8)
            else:
                image = np.zeros((S, S, 3), np.uint8)

        input_ids, attention_mask = self.tokenizer.encode(item["description"], o.max_length)
        record = {
            "image": image,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "label": np.int32(item["label"]),
            "image_id": image_id,
        }
        if self.tabular_map is not None:
            base = os.path.splitext(image_id)[0]
            record["tabular"] = self.tabular_map.get(
                base, np.zeros(self.tabular_dim, np.float32)
            )
        if self.llm_hidden_map is not None:
            base = os.path.splitext(image_id)[0]
            dim = self.opts.llm_hidden_dim
            first, last = self.llm_hidden_map.get(
                base, (np.zeros(0, np.float32), np.zeros(0, np.float32))
            )

            def fit(vec):
                out = np.zeros(dim, np.float32)
                n = min(dim, vec.shape[0])
                out[:n] = vec[:n]
                return out

            record["first_hidden"] = fit(first)
            record["last_hidden"] = fit(last)
        return record


def spine_dataset(image_dir: str, csv_path: str, text_json: str, tokenizer,
                  max_length: int = 256, canvas: int = CANVAS) -> MultimodalDataset:
    """MIBF Spine-style dataset: CSV columns `image,label`, CJK-stripped text
    (reference mibf_net/dataset_spine.py:14-99)."""
    opts = DatasetOptions(max_length=max_length, clean_cjk_text=True, canvas=canvas)
    return MultimodalDataset(image_dir, text_json, csv_path, tokenizer, opts)
