"""Vision checkpoint conversion parity (VERDICT r1 item 2).

Oracles are *random-weight* torch models with the exact torchvision/timm/HF
state_dict key layouts (torchvision and timm themselves are not installed
here); transformers' ViTModel/ConvNextModel provide the real HF layouts.
Same pattern as test_hf_convert.py: random weights prove the mapping, the
identical code path then consumes real AraEval-era checkpoints when
provisioned.
"""

import jax
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mpmc_tpu.models.resnet import ResNet
from mpmc_tpu.models.vision_convert import (convert_convnext_state_dict,
                                            convert_image_state_dict,
                                            convert_resnet_state_dict,
                                            convert_vit_state_dict)


# ---------------------------------------------------------------------------
# torch ResNet oracle with torchvision-compatible state_dict keys
# ---------------------------------------------------------------------------

class _TorchBasic(tnn.Module):
    expansion = 1

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class _TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1, groups=1, base_width=64):
        super().__init__()
        w = int(width * (base_width / 64.0)) * groups
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = tnn.Conv2d(w, w, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(w)
        self.conv3 = tnn.Conv2d(w, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


class _TorchResNet(tnn.Module):
    """Mirror of torchvision.models.resnet.ResNet's module tree/keys."""

    def __init__(self, block, depths, widths, groups=1, base_width=64,
                 num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, widths[0], 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(widths[0])
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = widths[0]
        for li, (depth, width) in enumerate(zip(depths, widths), 1):
            blocks = []
            for bi in range(depth):
                stride = 2 if (bi == 0 and li > 1) else 1
                if block is _TorchBasic:
                    blocks.append(block(cin, width, stride))
                else:
                    blocks.append(block(cin, width, stride, groups,
                                        base_width))
                cin = width * block.expansion
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in (1, 2, 3, 4):
            y = getattr(self, f"layer{li}")(y)
        return y.mean(dim=(2, 3))  # pooled features (pre-fc)


def _randomize_bn_stats(model, rng):
    """Random running stats so the batch_stats conversion is exercised."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.standard_normal(m.num_features) * 0.1,
                dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.random(m.num_features) * 0.5 + 0.5,
                dtype=torch.float32))


def _compare_resnet(block, depths, widths, flax_block, rng, groups=1,
                    base_width=64):
    torch.manual_seed(0)
    oracle = _TorchResNet(block, depths, widths, groups, base_width)
    with torch.no_grad():
        _randomize_bn_stats(oracle, rng)
    oracle.eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_resnet_state_dict(sd)

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    model = ResNet(depths, widths, flax_block, groups=groups,
                   base_width=base_width, stem_width=widths[0])
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_resnet18_conversion_parity(rng):
    """reference flagship 2C image branch (Multimodal_example_task2C.py:83)."""
    _compare_resnet(_TorchBasic, (2, 2, 2, 2), (16, 32, 32, 64), "basic", rng)


@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_resnet50_conversion_parity(rng):
    """reference shipped-folds run + organizer 2C baseline (resnet50)."""
    _compare_resnet(_TorchBottleneck, (1, 1, 2, 1), (8, 16, 16, 32),
                    "bottleneck", rng)


def test_resnext_conversion_parity(rng):
    """2B zoo ResNeXt50_32x4d (Untitled-2.py:362-371) — grouped convs."""
    _compare_resnet(_TorchBottleneck, (1, 1, 1, 1), (8, 16, 16, 32),
                    "bottleneck", rng, groups=4, base_width=8)


# ---------------------------------------------------------------------------
# ViT — HF ViTModel oracle + timm-layout synthetic
# ---------------------------------------------------------------------------

def test_vit_hf_conversion_parity(rng):
    from transformers import ViTConfig, ViTModel
    from mpmc_tpu.models.vit import ViT

    cfg = ViTConfig(hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=128,
                    image_size=32, patch_size=16, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    oracle = ViTModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_vit_state_dict(sd, num_heads=4)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(np.transpose(x, (0, 3, 1, 2)))
                     ).last_hidden_state[:, 0].numpy()
    model = ViT(patch_size=16, hidden_size=64, num_layers=2, num_heads=4,
                mlp_dim=128, ln_eps=1e-12)  # HF ViT layer_norm_eps
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_vit_timm_layout_conversion(rng):
    """timm key layout (the 2B zoo's vit_base_patch16_384 etc.): packed qkv.
    Built synthetically from the HF oracle's tensors so the timm and HF
    paths must agree exactly."""
    from transformers import ViTConfig, ViTModel
    from mpmc_tpu.models.vit import ViT

    cfg = ViTConfig(hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=128,
                    image_size=32, patch_size=16, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    oracle = ViTModel(cfg, add_pooling_layer=False).eval()
    hf = {k: v.numpy() for k, v in oracle.state_dict().items()}

    timm = {"cls_token": hf["embeddings.cls_token"],
            "pos_embed": hf["embeddings.position_embeddings"],
            "patch_embed.proj.weight":
                hf["embeddings.patch_embeddings.projection.weight"],
            "patch_embed.proj.bias":
                hf["embeddings.patch_embeddings.projection.bias"],
            "norm.weight": hf["layernorm.weight"],
            "norm.bias": hf["layernorm.bias"]}
    for i in range(2):
        h = f"encoder.layer.{i}."
        t = f"blocks.{i}."
        timm[t + "norm1.weight"] = hf[h + "layernorm_before.weight"]
        timm[t + "norm1.bias"] = hf[h + "layernorm_before.bias"]
        timm[t + "attn.qkv.weight"] = np.concatenate(
            [hf[h + f"attention.attention.{n}.weight"]
             for n in ("query", "key", "value")])
        timm[t + "attn.qkv.bias"] = np.concatenate(
            [hf[h + f"attention.attention.{n}.bias"]
             for n in ("query", "key", "value")])
        timm[t + "attn.proj.weight"] = hf[h + "attention.output.dense.weight"]
        timm[t + "attn.proj.bias"] = hf[h + "attention.output.dense.bias"]
        timm[t + "norm2.weight"] = hf[h + "layernorm_after.weight"]
        timm[t + "norm2.bias"] = hf[h + "layernorm_after.bias"]
        timm[t + "mlp.fc1.weight"] = hf[h + "intermediate.dense.weight"]
        timm[t + "mlp.fc1.bias"] = hf[h + "intermediate.dense.bias"]
        timm[t + "mlp.fc2.weight"] = hf[h + "output.dense.weight"]
        timm[t + "mlp.fc2.bias"] = hf[h + "output.dense.bias"]

    v_hf = convert_vit_state_dict(hf, num_heads=4)
    v_timm = convert_vit_state_dict(timm, num_heads=4)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    model = ViT(patch_size=16, hidden_size=64, num_layers=2, num_heads=4,
                mlp_dim=128, ln_eps=1e-12)
    np.testing.assert_allclose(
        np.asarray(model.apply(v_timm, x, train=False)),
        np.asarray(model.apply(v_hf, x, train=False)), rtol=1e-6)


# ---------------------------------------------------------------------------
# ConvNeXt — HF ConvNextModel oracle
# ---------------------------------------------------------------------------

@pytest.mark.slow  # heavy parity: covered by the per-round --runslow suite
def test_convnext_hf_conversion_parity(rng):
    from transformers import ConvNextConfig, ConvNextModel
    from mpmc_tpu.models.convnext import ConvNeXt

    depths, dims = (1, 1, 2, 1), (8, 16, 32, 64)
    cfg = ConvNextConfig(depths=list(depths), hidden_sizes=list(dims),
                         num_channels=3)
    torch.manual_seed(3)
    oracle = ConvNextModel(cfg).eval()
    # randomize layer_scale so the gamma path is non-trivial
    with torch.no_grad():
        for name, par in oracle.named_parameters():
            if "layer_scale" in name:
                par.copy_(torch.rand_like(par))
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_convnext_state_dict(sd, depths=depths)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(np.transpose(x, (0, 3, 1, 2)))
                     ).pooler_output.numpy()
    model = ConvNeXt(depths, dims)
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_dispatch_rejects_unknown_arch():
    with pytest.raises(ValueError, match="no converter"):
        convert_image_state_dict({}, "densenet161")
