"""Measure the PyTorch-CPU reference-equivalent training throughput.

The reference (Barbany/bifold) trains SiglipSequential — SigLIP-base dual
towers + 8-layer fusion + 4 conv decoders — single-process torch, batch 2
(conf/config.yaml:12-22). That exact model cannot run here (no HF weights,
no GPU torch), so this builds an architecture-equivalent torch model with the
same dims/sequence lengths/compute graph (LoRA-frozen towers, trainable
fusion+heads), times fwd+bwd+Adam steps on CPU, and writes the measured
samples/sec into BENCH_BASELINE.json for bench.py's ``vs_baseline`` ratio.

Run: python scripts/measure_torch_baseline.py [--steps 3] [--image-size 384]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import torch
import torch.nn as nn


class Tower(nn.Module):
    """ViT-style tower: 12 pre-norm blocks, d=768, mlp 3072 (SigLIP-base)."""

    def __init__(self, dim=768, layers=12, heads=12, seq=576):
        super().__init__()
        layer = nn.TransformerEncoderLayer(
            dim, heads, 4 * dim, dropout=0.0, batch_first=True,
            norm_first=True, activation="gelu")
        self.encoder = nn.TransformerEncoder(layer, layers)
        self.pos = nn.Parameter(torch.zeros(1, seq, dim))

    def forward(self, x):
        return self.encoder(x + self.pos)


class TorchBiFoldProxy(nn.Module):
    def __init__(self, image_size=384, patch=16, dim=768, context=3,
                 fusion_depth=8, fusion_heads=16, text_len=64, bimanual=True):
        super().__init__()
        self.np_side = image_size // patch
        n_patches = self.np_side ** 2
        self.patch_embed = nn.Conv2d(3, dim, patch, stride=patch)
        self.vision = Tower(dim, 12, 12, n_patches)
        self.text_embed = nn.Embedding(32000, dim)
        self.text = Tower(dim, 12, 12, text_len)
        self.context = context
        fusion_layer = nn.TransformerEncoderLayer(
            dim, fusion_heads, 4 * dim, dropout=0.0, batch_first=True,
            norm_first=True, activation="gelu")
        self.fusion = nn.TransformerEncoder(fusion_layer, fusion_depth)
        self.n_heads = 4 if bimanual else 2
        self.decoders = nn.ModuleList()
        for _ in range(self.n_heads):
            self.decoders.append(nn.Sequential(
                nn.Upsample(scale_factor=2, mode="bilinear"), nn.Conv2d(dim, dim, 1),
                nn.Upsample(scale_factor=2, mode="bilinear"), nn.Conv2d(dim, dim // 2, 1),
                nn.Upsample(scale_factor=2, mode="bilinear"), nn.Conv2d(dim // 2, dim // 4, 1),
                nn.Upsample(scale_factor=2, mode="bilinear"), nn.Conv2d(dim // 4, 1, 1),
            ))
        # freeze towers as the reference does (LoRA-only would add small
        # adapter matmuls; freezing is the closest cheap-side equivalent)
        for mod in (self.vision, self.text, self.patch_embed, self.text_embed):
            for p in mod.parameters():
                p.requires_grad_(False)

    def forward(self, rgb, ctx, ids):
        b = rgb.shape[0]
        frames = torch.cat([rgb[:, None], ctx], dim=1)  # (B, 1+T, 3, H, W)
        t = frames.shape[1]
        x = self.patch_embed(frames.flatten(0, 1)).flatten(2).transpose(1, 2)
        vis = self.vision(x)  # ((1+T)B, P, D)
        vis = vis.reshape(b, t * vis.shape[1], -1)
        txt = self.text(self.text_embed(ids))
        fused = self.fusion(torch.cat([txt, vis], dim=1))
        n_patches = self.np_side ** 2
        cur = fused[:, -n_patches:].transpose(1, 2).reshape(
            b, -1, self.np_side, self.np_side)
        return [torch.sigmoid(dec(cur)) for dec in self.decoders]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--batch", type=int, default=2)  # reference batch size
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--context", type=int, default=3)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "BENCH_BASELINE.json"))
    args = ap.parse_args()

    torch.manual_seed(0)
    model = TorchBiFoldProxy(image_size=args.image_size, context=args.context)
    opt = torch.optim.Adam([p for p in model.parameters() if p.requires_grad],
                           lr=1e-4)
    b, s = args.batch, args.image_size
    rgb = torch.randn(b, 3, s, s)
    ctx = torch.randn(b, args.context, 3, s, s)
    ids = torch.randint(0, 32000, (b, 64))
    target = torch.rand(b, 1, s, s)
    bce = nn.BCELoss()

    def step():
        opt.zero_grad()
        outs = model(rgb, ctx, ids)
        loss = sum(bce(o, target) for o in outs)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.time()
    for _ in range(args.steps):
        loss = step()
    dt = (time.time() - t0) / args.steps
    throughput = b / dt
    result = {
        "torch_cpu_train_samples_per_sec": throughput,
        "step_time_s": dt,
        "batch": b,
        "image_size": s,
        "context": args.context,
        "loss": loss,
        "torch_threads": torch.get_num_threads(),
        "note": "architecture-equivalent torch-CPU proxy of the reference "
                "SiglipSequential training step (see module docstring)",
    }
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
