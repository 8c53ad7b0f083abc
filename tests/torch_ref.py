"""Torch golden models for numerics parity tests.

Independent CPU-torch implementations of the architectures the reference
builds on (the standard vit-pytorch 3D ViT and torch built-ins), written from
the behavioral spec in SURVEY.md §2. Used only in tests as the numerics
oracle; weights are copied from/to the JAX models through the torch-style
state-dict mapping.
"""

import torch
import torch.nn as nn
from einops import rearrange


class TorchFeedForward(nn.Module):
    def __init__(self, dim, hidden_dim, dropout=0.0):
        super().__init__()
        self.net = nn.Sequential(
            nn.LayerNorm(dim), nn.Linear(dim, hidden_dim), nn.GELU(),
            nn.Dropout(dropout), nn.Linear(hidden_dim, dim),
            nn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class TorchAttention(nn.Module):
    def __init__(self, dim, heads, dim_head, dropout=0.0):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.norm = nn.LayerNorm(dim)
        self.attend_drop = nn.Dropout(dropout)   # on attn probs (vit_3d.py:44)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(dropout))

    def forward(self, x):
        x = self.norm(x)
        qkv = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = [rearrange(t, "b n (h d) -> b h n d", h=self.heads)
                   for t in qkv]
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        attn = self.attend_drop(attn)
        out = rearrange(attn @ v, "b h n d -> b n (h d)")
        return self.to_out(out)


class TorchViT3D(nn.Module):
    """Pre-norm 3D ViT with (f h w)/(p1 p2 pf c) patch ordering and CLS pool."""

    def __init__(self, *, image_size, image_patch_size, frames,
                 frame_patch_size, num_classes, dim, depth, heads, dim_head,
                 mlp_dim, channels=1, pool="cls", dropout=0.0,
                 emb_dropout=0.0):
        super().__init__()
        f = frames // frame_patch_size
        h = image_size // image_patch_size
        num_patches = f * h * h
        patch_dim = channels * image_patch_size ** 2 * frame_patch_size
        self.patch_sizes = (frame_patch_size, image_patch_size)
        self.pool = pool
        self.to_patch_embedding = nn.Sequential(
            nn.Identity(),                      # slot 0: rearrange (done in forward)
            nn.LayerNorm(patch_dim),
            nn.Linear(patch_dim, dim),
            nn.LayerNorm(dim))
        self.pos_embedding = nn.Parameter(torch.randn(1, num_patches + 1, dim))
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim))
        self.emb_dropout = nn.Dropout(emb_dropout)
        self.layers = nn.ModuleList([
            nn.ModuleList([TorchAttention(dim, heads, dim_head, dropout),
                           TorchFeedForward(dim, mlp_dim, dropout)])
            for _ in range(depth)])
        self.mlp_head = nn.Sequential(nn.LayerNorm(dim),
                                      nn.Linear(dim, num_classes))

    def forward(self, video):
        pf, p = self.patch_sizes
        x = rearrange(video,
                      "b c (f pf) (h p1) (w p2) -> b (f h w) (p1 p2 pf c)",
                      pf=pf, p1=p, p2=p)
        for m in list(self.to_patch_embedding)[1:]:
            x = m(x)
        b, n, _ = x.shape
        cls = self.cls_token.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embedding[:, : n + 1]
        x = self.emb_dropout(x)
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        x = x.mean(dim=1) if self.pool == "mean" else x[:, 0]
        return self.mlp_head(x)

    def ref_state_dict(self, prefix="volume_encoder.vit3d."):
        """Rename to the reference checkpoint key scheme: our ``layers`` ==
        reference ``transformer.layers``; all submodule names/indices already
        match (norm, to_qkv, to_out.0, net.0/1/4, to_patch_embedding.1/2/3)."""
        out = {}
        for k, v in self.state_dict().items():
            if k.startswith("layers."):
                k = "transformer." + k
            out[prefix + k] = v.detach().numpy()
        return out


class TorchBasicBlock3D(nn.Module):
    """3D BasicBlock with the reference's module names (conv1/bn1/conv2/bn2/
    downsample — src/models/resnet_3d.py:26-56)."""

    def __init__(self, in_planes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv3d(in_planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.downsample = downsample

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + residual)


class TorchResNet3D(nn.Module):
    """Torch numerics oracle for the 3D ResNet (basic-block depths), with the
    reference's exact module/state-dict layout (src/models/resnet_3d.py:
    96-176): conv1/bn1/maxpool stem, layer1..4, avgpool, fc."""

    def __init__(self, *, layers=(1, 1, 1, 1), n_classes=2,
                 n_input_channels=1):
        super().__init__()
        planes = (64, 128, 256, 512)
        self.conv1 = nn.Conv3d(n_input_channels, 64, (7, 7, 7),
                               stride=(1, 2, 2), padding=(3, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.maxpool = nn.MaxPool3d(3, stride=2, padding=1)
        in_planes = 64
        for s, (p, n) in enumerate(zip(planes, layers)):
            blocks = []
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                downsample = None
                if stride != 1 or in_planes != p:
                    downsample = nn.Sequential(
                        nn.Conv3d(in_planes, p, 1, stride=stride, bias=False),
                        nn.BatchNorm3d(p))
                blocks.append(TorchBasicBlock3D(in_planes, p, stride,
                                                downsample))
                in_planes = p
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool3d(1)
        self.fc = nn.Linear(512, n_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)

    def ref_state_dict(self, prefix="resnet_3d.resnet."):
        """Keys as an older-revision reference checkpoint would carry them
        (model.resnet_3d.resnet..., xAi_gradcam_Resnet3D/gradcam.py:29)."""
        return {prefix + k: v.detach().numpy()
                for k, v in self.state_dict().items()}
