"""One-time CPU baseline measurement for bench.py's ``vs_baseline``.

The reference system is single-device torch (SURVEY.md §0); with no GPU in
this image its execution model is torch-CPU.  This script builds the
architectural equivalent of the flagship 2C model in torch (two BERT-base
encoders — AraBERT 64k vocab + RoBERTa 50k vocab — a basic-block [2,2,2,2]
ResNet-18 via transformers' ResNetModel, projection FCs, concat-gate fusion,
focal loss) and times fwd+bwd at the reference's batch size 16 / seq 512 /
224² images.  Result is written to BASELINE_CPU.json and reused by bench.py.

Run: ``python tools/bench_baseline_torch.py [num_steps]``
"""

import json
import sys
import time

import torch
import torch.nn as nn
import torch.nn.functional as F
from transformers import BertConfig, BertModel, ResNetConfig, ResNetModel

torch.manual_seed(0)


class TorchFlagship(nn.Module):
    def __init__(self):
        super().__init__()
        self.text = BertModel(BertConfig(vocab_size=64000))
        self.caption = BertModel(BertConfig(vocab_size=50265))
        self.image = ResNetModel(ResNetConfig(
            layer_type="basic", depths=[2, 2, 2, 2],
            hidden_sizes=[64, 128, 256, 512], embedding_size=64))
        self.image_head = nn.Sequential(
            nn.Linear(512, 512), nn.ReLU(), nn.Dropout(0.35),
            nn.Linear(512, 512))
        self.text_fc = nn.Sequential(nn.Linear(768, 512),
                                     nn.BatchNorm1d(512), nn.ReLU())
        self.cap_fc = nn.Sequential(nn.Linear(768, 512),
                                    nn.BatchNorm1d(512), nn.ReLU())
        self.gate = nn.Sequential(nn.Linear(1536, 1536),
                                  nn.BatchNorm1d(1536), nn.ReLU(),
                                  nn.Softmax(dim=1))
        self.reduce = nn.Sequential(nn.Linear(1536, 512),
                                    nn.BatchNorm1d(512), nn.ReLU())
        self.out = nn.Sequential(nn.Linear(512, 1), nn.BatchNorm1d(1))

    def forward(self, ids, mask, img, cap_ids, cap_mask):
        t = self.text_fc(self.text(ids, attention_mask=mask
                                   ).last_hidden_state[:, 0])
        c = self.cap_fc(self.caption(cap_ids, attention_mask=cap_mask
                                     ).last_hidden_state[:, 0])
        i = self.image_head(self.image(img).pooler_output.flatten(1))
        cat = torch.cat([t, i, c], dim=1)
        fused = self.reduce(self.gate(cat) * cat)
        return self.out(fused).squeeze(1)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    B, S = 16, 512
    model = TorchFlagship()
    opt = torch.optim.Adam(model.parameters(), lr=1e-5)
    ids = torch.randint(5, 64000, (B, S))
    cap = torch.randint(5, 50265, (B, S))
    mask = torch.ones(B, S)
    img = torch.rand(B, 3, 224, 224)
    y = (torch.rand(B) > 0.6).float()

    times = []
    for step in range(steps + 1):
        t0 = time.time()
        opt.zero_grad()
        logits = model(ids, mask, img, cap, mask)
        p = torch.sigmoid(logits)
        ce = F.binary_cross_entropy_with_logits(logits, y, reduction="none")
        p_t = p * y + (1 - p) * (1 - y)
        loss = (0.25 * y + 0.75 * (1 - y)) * ce * (1 - p_t) ** 2
        loss.mean().backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        dt = time.time() - t0
        print(f"step {step}: {dt:.2f}s", flush=True)
        if step > 0:  # skip warmup
            times.append(dt)

    sec = sum(times) / len(times)
    result = {
        "metric": "memes/sec (2C fine-tune fwd+bwd, torch CPU)",
        "batch_size": B,
        "sec_per_step": sec,
        "memes_per_sec": B / sec,
        "threads": torch.get_num_threads(),
    }
    with open("BASELINE_CPU.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
