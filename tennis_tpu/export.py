"""Ahead-of-time exporter: a trained vision experiment → one serialized
StableHLO artifact, loadable for serving WITHOUT the model code.

No reference counterpart (the reference serves straight from its training
stack); this is the deployment-side completion of the inference layer —
``tennis_tpu.inference.load_classifier`` builds the live jitted scorer,
this module freezes the SAME device program (fused uint8→normalize→bf16
forward→softmax, best-epoch params baked in as constants) through
``jax.export`` into a versioned, platform-tagged binary plus a JSON sidecar
(classes, shapes, provenance). ``load_exported`` then rebuilds the scorer
from the two files alone — no flax module tree, no checkpoint template, no
flag surface — which is what a serving fleet wants to ship.

CLI (flags mirror the documented evaluation surface):

    python -m tennis_tpu.export --model_id 0006 --backbone DenseNet121 \
        --batch_size 8 --platforms tpu,cpu --out 0006.hlo

Export is shape-static by design (XLA compiles one program per geometry):
pick the serving batch size here; the HTTP layer's request coalescing
(tennis_tpu.serve) pads to a fixed batch for exactly this reason.
"""
from __future__ import annotations

import json
import os

import numpy as np
from absl import logging

_META_SUFFIX = ".json"
_FORMAT_VERSION = 1


def export_classifier(backbone: str, model_id: str, data_shape: int,
                      batch_size: int, root: str = "data",
                      platforms=None):
    """Freeze the experiment's best epoch into (serialized_bytes, meta).

    The exported callable maps a uint8 image batch (B, S, S, 3) to f32
    softmax probabilities (B, num_classes); params/batch-stats are baked in
    as program constants so the artifact is self-contained.

    ``platforms``: lowering platforms tuple (e.g. ``("tpu", "cpu")``);
    defaults to jax's current default backend.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.inference import load_classifier_state

    classes, model, state, info = load_classifier_state(
        backbone, model_id, data_shape, root)
    params, batch_stats = state.params, state.batch_stats

    def scorer(images):
        x = device_prepare(images)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1).astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch_size, data_shape, data_shape, 3),
                                jnp.uint8)
    exp = jexport.export(jax.jit(scorer),
                         platforms=tuple(platforms) if platforms else None)(
        spec)
    blob = exp.serialize()
    meta = {
        "format_version": _FORMAT_VERSION,
        "kind": "vision-classifier",
        "backbone": backbone,
        "model_id": model_id,
        "classes": list(classes),
        "batch_size": int(batch_size),
        "data_shape": int(data_shape),
        "input": {"shape": [batch_size, data_shape, data_shape, 3],
                  "dtype": "uint8"},
        "output": {"shape": [batch_size, len(classes)], "dtype": "float32"},
        "platforms": list(exp.platforms),
        "epoch": int(info["epoch"]),
        "score": None if info["score"] is None else float(info["score"]),
        "exp_dir": info["exp_dir"],
    }
    return blob, meta


def save_exported(out_path: str, blob: bytes, meta: dict) -> None:
    """Write ``out_path`` (the serialized program) + ``out_path + '.json'``
    (the sidecar), each via temp + atomic replace."""
    for path, data in ((out_path, blob),
                       (out_path + _META_SUFFIX,
                        json.dumps(meta, indent=1).encode())):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)


def load_exported(path: str):
    """Rebuild ``(classes, predict_probs, meta)`` from an exported artifact —
    the drop-in shape of ``tennis_tpu.inference.load_classifier``, with zero
    model-code dependency. ``predict_probs`` maps a uint8 (B, S, S, 3) batch
    (B fixed at export time) to host-side (B, num_classes) float32 softmax."""
    from jax import export as jexport

    with open(path, "rb") as f:
        rebuilt = jexport.deserialize(f.read())
    with open(path + _META_SUFFIX) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"{path}: unsupported export format {meta.get('format_version')} "
            f"(this loader reads version {_FORMAT_VERSION})")
    expect = tuple(meta["input"]["shape"])

    def predict_probs(images) -> np.ndarray:
        images = np.asarray(images)
        if images.shape != expect or images.dtype != np.uint8:
            raise ValueError(
                f"exported program is shape-static: expected uint8 {expect}, "
                f"got {images.dtype} {images.shape}")
        return np.asarray(rebuilt.call(images))

    return list(meta["classes"]), predict_probs, meta


def main(_argv=None):
    import sys

    from absl import flags

    fv = flags.FlagValues()
    flags.DEFINE_string("root", "data", "dataset root (classes.names)",
                        flag_values=fv)
    flags.DEFINE_string("model_id", "0006", "vision experiment id",
                        flag_values=fv)
    flags.DEFINE_string("backbone", "DenseNet121", "backbone the experiment "
                        "was trained with", flag_values=fv)
    flags.DEFINE_integer("data_shape", 512, "input crop side", flag_values=fv)
    flags.DEFINE_integer("batch_size", 8, "static serving batch size",
                         flag_values=fv)
    flags.DEFINE_string("platforms", "", "comma-separated lowering platforms "
                        "(e.g. tpu,cpu); empty = current default backend",
                        flag_values=fv)
    flags.DEFINE_string("out", "", "artifact path (default: "
                        "<exp_dir>/export_b<B>_s<S>.hlo)", flag_values=fv)
    fv(["export"] + list(sys.argv[1:] if _argv is None else _argv))

    platforms = [p.strip() for p in fv.platforms.split(",") if p.strip()]
    blob, meta = export_classifier(fv.backbone, fv.model_id, fv.data_shape,
                                   fv.batch_size, root=fv.root,
                                   platforms=platforms or None)
    out = fv.out or os.path.join(
        meta["exp_dir"], f"export_b{fv.batch_size}_s{fv.data_shape}.hlo")
    save_exported(out, blob, meta)
    logging.info("exported %s (%d bytes, platforms=%s) + %s",
                 out, len(blob), ",".join(meta["platforms"]),
                 out + _META_SUFFIX)
    print(f"exported {out} ({len(blob)} bytes, "
          f"platforms={','.join(meta['platforms'])})")


if __name__ == "__main__":
    main()
