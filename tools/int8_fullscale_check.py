"""int8 serving decision fidelity at the SHIPPED geometry, on TRAINED weights.

VERDICT r3 item 7: the int8 accuracy claim previously rested on random
weights ("no argmax claim" — near-flat heatmaps make the argmax itself
noise). This tool manufactures genuinely non-flat heatmaps the honest way:
it overfits the flagship model (SiglipSequential 384, 768-dim towers,
depth-8 fusion, LoRA — bench._flagship, the exact benched program) on a
fixed 2-sample batch for a few hundred steps on the real chip (~84 ms/step,
so ~half a minute of compute), then serves the SAME observation through
  (a) f32-master serving (cast_params=False),
  (b) the shipped bf16-precast serving, and
  (c) int8 weight-only serving (serving.quantize_weights),
and compares the decoded pick/place pixels + heatmap peaks/margins.

Prints ONE JSON line. Driven by
tests/test_int8_decision.py::test_int8_argmax_agreement_fullscale
(BIFOLD_FULLSCALE=1) which asserts pixel agreement; runnable standalone:

  python tools/int8_fullscale_check.py --steps 400

The reference has no int8 path (torch f32 end-to-end); this validates a
TPU-rebuild-only serving lever against the BASELINE.md output-fidelity gate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

HEADS = ("left_pick", "right_pick", "left_place", "right_place")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

    import bench
    from bifold_tpu.data.processor import Processor
    from bifold_tpu.serving import ServingModel

    print(f"[int8_check] backend={jax.default_backend()} "
          f"devices={jax.devices()}", file=sys.stderr)
    (model, _proc, raw, device_batch, params, opt_state,
     step) = bench._flagship(2, image_size=args.image_size)

    state = (params, opt_state, {}, jax.random.key(0))
    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, device_batch)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"[int8_check] step {i}: loss={float(metrics['loss']):.4f}",
                  file=sys.stderr)
    loss_final = float(metrics["loss"])
    print(f"[int8_check] trained {args.steps} steps in {time.time()-t0:.1f}s",
          file=sys.stderr)

    # serve-side processor (test partition: no augmentation)
    s = args.image_size
    proc = Processor(
        {"model_image_size": s, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False, "strategy": "gmm",
         "mask_depth": True, "standardize_depth": False},
        partition="test", max_context_length=3, autoprocessor_name="siglip")

    # the observation = training sample 0, raw pixel form
    ctx = [dict(rgb=np.asarray(raw["ctx_rgb"][0, i]),
                depth=np.asarray(raw["ctx_depth"][0, i]),
                mask=np.asarray(raw["ctx_mask"][0, i]))
           for i in range(raw["ctx_rgb"].shape[1])]
    obs = dict(rgb=np.asarray(raw["rgb"][0]),
               depth=np.asarray(raw["depth"][0]),
               mask=np.asarray(raw["mask"][0], np.float32),
               instruction="fold the left sleeve inward", context=ctx)

    trained = {"params": jax.device_get(state[0])}
    servers = {
        "f32": ServingModel(model, trained, proc, threshold=0.01,
                            cast_params=False),
        "bf16": ServingModel(model, trained, proc, threshold=0.01),
        "int8": ServingModel(model, trained, proc, threshold=0.01,
                             quantize="int8"),
    }
    acts, raws = {}, {}
    for name, server in servers.items():
        acts[name], raws[name] = server.predict(**obs, return_raw_output=True)

    report = {"steps": args.steps, "loss_final": loss_final,
              "image_size": s, "heads": {}}
    agree_int8, agree_bf16 = True, True
    for h in HEADS:
        hm = np.asarray(raws["f32"][f"{h}_heatmap"],
                        np.float32).reshape(s, s)
        flat = np.sort(hm, axis=None)
        peak, second = float(flat[-1]), float(flat[-2])
        margin_med = peak - float(np.median(flat))
        entry = {"peak": peak, "top2_gap": peak - second,
                 "margin_vs_median": margin_med}
        for name in servers:
            # Action fields arrive as (2,) or batch-1 (1, 2); flatten to (y, x)
            px = np.asarray(getattr(acts[name], h), np.float64).reshape(-1)
            entry[f"{name}_pixel"] = [float(v) for v in px]
        d8 = float(np.linalg.norm(
            np.asarray(entry["int8_pixel"]) - np.asarray(entry["f32_pixel"])))
        d16 = float(np.linalg.norm(
            np.asarray(entry["bf16_pixel"]) - np.asarray(entry["f32_pixel"])))
        entry["dist_int8_f32_px"] = d8
        entry["dist_bf16_f32_px"] = d16
        # sigmoid-space deviation on the full map, int8 vs f32
        hm8 = np.asarray(raws["int8"][f"{h}_heatmap"],
                         np.float32).reshape(s, s)
        entry["int8_sigmoid_maxdelta"] = float(np.max(np.abs(hm8 - hm)))
        agree_int8 &= d8 <= 2.0
        agree_bf16 &= d16 <= 2.0
        report["heads"][h] = entry
    report["agree_int8_f32_within_2px"] = bool(agree_int8)
    report["agree_bf16_f32_within_2px"] = bool(agree_bf16)
    line = json.dumps(report)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line)


if __name__ == "__main__":
    main()
