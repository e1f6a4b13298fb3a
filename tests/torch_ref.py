"""A compact PyTorch implementation of the STA architecture used ONLY as a
test oracle for checkpoint conversion and numerical parity.

This transcribes the documented behavior of the reference model
(vista_slam/sta_model/*) with the same state-dict key layout, so that
models/convert.py can be validated end-to-end on random weights: build this
torch model, convert its state dict, and require the JAX forward to
reproduce the torch forward to fp32 tolerance.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class RoPE2D(nn.Module):
    def __init__(self, base=100.0):
        super().__init__()
        self.base = base

    @staticmethod
    def rotate_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def rope1d(self, tokens, pos1d):
        q = tokens.size(-1) // 2
        inv = 1.0 / (self.base ** (torch.arange(q, dtype=tokens.dtype) / q))
        freqs = pos1d.to(tokens.dtype).unsqueeze(-1) * inv
        cos = torch.cat([freqs.cos()] * 2, -1).unsqueeze(1)
        sin = torch.cat([freqs.sin()] * 2, -1).unsqueeze(1)
        return tokens * cos + self.rotate_half(tokens) * sin

    def forward(self, tokens, positions):
        d = tokens.size(3) // 2
        y, x = tokens.chunk(2, dim=-1)
        y = self.rope1d(y, positions[:, :, 0])
        x = self.rope1d(x, positions[:, :, 1])
        return torch.cat((y, x), dim=-1)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Attention(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.h = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, x, pos):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, C // self.h).transpose(1, 3)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = self.rope(q, pos), self.rope(k, pos)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class CrossAttention(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.h = heads
        self.scale = (dim // heads) ** -0.5
        self.projq = nn.Linear(dim, dim, bias=True)
        self.projk = nn.Linear(dim, dim, bias=True)
        self.projv = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, x, y, qpos, kpos):
        B, Nq, C = x.shape
        Nk = y.shape[1]
        q = self.projq(x).reshape(B, Nq, self.h, C // self.h).permute(0, 2, 1, 3)
        k = self.projk(y).reshape(B, Nk, self.h, C // self.h).permute(0, 2, 1, 3)
        v = self.projv(y).reshape(B, Nk, self.h, C // self.h).permute(0, 2, 1, 3)
        q, k = self.rope(q, qpos), self.rope(k, kpos)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, Nq, C)
        return self.proj(x)


class EncBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, dim * mlp_ratio)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        return x + self.mlp(self.norm2(x))


class DecBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads, rope)
        self.cross_attn = CrossAttention(dim, heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, dim * mlp_ratio)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, xpos, ypos)
        return x + self.mlp(self.norm3(x))


class RCU(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class Fusion(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = RCU(f)
        self.resConfUnit2 = RCU(f)
        self.out_conv = nn.Conv2d(f, f, 1)

    def forward(self, *xs):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        out = F.interpolate(out, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(out)


class DPT(nn.Module):
    def __init__(self, dims, layer_dims=(96, 192, 384, 768), f=256, last=128, out_ch=4):
        super().__init__()
        self.act_postprocess = nn.ModuleList([
            nn.Sequential(nn.Conv2d(dims[0], layer_dims[0], 1),
                          nn.ConvTranspose2d(layer_dims[0], layer_dims[0], 4, 4)),
            nn.Sequential(nn.Conv2d(dims[1], layer_dims[1], 1),
                          nn.ConvTranspose2d(layer_dims[1], layer_dims[1], 2, 2)),
            nn.Sequential(nn.Conv2d(dims[2], layer_dims[2], 1)),
            nn.Sequential(nn.Conv2d(dims[3], layer_dims[3], 1),
                          nn.Conv2d(layer_dims[3], layer_dims[3], 3, 2, 1)),
        ])
        self.scratch = nn.Module()
        for n, ld in enumerate(layer_dims):
            setattr(self.scratch, f"layer{n+1}_rn", nn.Conv2d(ld, f, 3, padding=1, bias=False))
        for n in range(1, 5):
            setattr(self.scratch, f"refinenet{n}", Fusion(f))
        self.head = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, padding=1),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(f // 2, last, 3, padding=1),
            nn.ReLU(True),
            nn.Conv2d(last, out_ch, 1),
        )

    def forward(self, hooks, nh, nw):
        layers = [t.permute(0, 2, 1).reshape(t.shape[0], t.shape[2], nh, nw)
                  for t in hooks]
        layers = [self.act_postprocess[i](l) for i, l in enumerate(layers)]
        layers = [getattr(self.scratch, f"layer{i+1}_rn")(l) for i, l in enumerate(layers)]
        p4 = self.scratch.refinenet4(layers[3])[:, :, : layers[2].shape[2], : layers[2].shape[3]]
        p3 = self.scratch.refinenet3(p4, layers[2])
        p2 = self.scratch.refinenet2(p3, layers[1])
        p1 = self.scratch.refinenet1(p2, layers[0])
        return self.head(p1)


class PoseHead(nn.Module):
    def __init__(self, dim, hidden=512):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(dim, hidden), nn.ReLU(),
                                 nn.Linear(hidden, hidden), nn.ReLU(),
                                 nn.Linear(hidden, hidden), nn.ReLU())
        self.fc_t = nn.Linear(hidden, 3)
        self.fc_rot = nn.Linear(hidden, 9)
        self.fc_conf = nn.Sequential(nn.Linear(hidden, 1), nn.Sigmoid())

    @staticmethod
    def svd_orth(m):
        m = m.reshape(-1, 3, 3)
        mt = F.normalize(m, p=2, dim=-1).transpose(-1, -2)
        u, s, v = torch.svd(mt)
        det = torch.det(v @ u.transpose(-2, -1))
        return torch.cat([v[:, :, :-1], v[:, :, -1:] * det.view(-1, 1, 1)], 2) @ u.transpose(-2, -1)

    def forward(self, tok):
        f = self.mlp(tok)
        t = self.fc_t(f)
        r = self.svd_orth(self.fc_rot(f))
        conf = self.fc_conf(f).squeeze(-1)
        pose = torch.zeros(tok.shape[0], 4, 4)
        pose[:, :3, :3] = r
        pose[:, :3, 3] = t
        pose[:, 3, 3] = 1.0
        return pose, conf


class TorchSTA(nn.Module):
    """Key layout mirrors the reference state dict (patch_embed.proj,
    enc_blocks.N, dec_block.N, decoder_embed, init_pose_token, dec_norm,
    downstream_head_pts.dpt, head_pose_s)."""

    def __init__(self, img=64, patch=16, ed=64, edep=2, eh=4, dd=48, ddep=4,
                 dh=4, mlp_ratio=2):
        super().__init__()
        self.patch = patch
        self.grid = img // patch
        self.rope = RoPE2D()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, ed, patch, patch)
        self.patch_embed = pe
        self.enc_blocks = nn.ModuleList(
            [EncBlock(ed, eh, mlp_ratio, self.rope) for _ in range(edep)])
        self.decoder_embed = nn.Linear(ed, dd)
        self.dec_block = nn.ModuleList(
            [DecBlock(dd, dh, mlp_ratio, self.rope) for _ in range(ddep)])
        self.dec_norm = nn.LayerNorm(dd, eps=1e-6)
        self.init_pose_token = nn.Parameter(torch.randn(1, 1, dd) * 0.02)
        hp = nn.Module()
        hp.dpt = DPT((ed, dd, dd, dd))
        self.downstream_head_pts = hp
        self.head_pose_s = PoseHead(dd)
        self.ddep = ddep
        self.hooks = (0, ddep * 2 // 4 + 1, ddep * 3 // 4 + 1, ddep + 1)

    def positions(self, b, special=False):
        g = self.grid
        ys, xs = torch.meshgrid(torch.arange(g), torch.arange(g), indexing="ij")
        pos = torch.stack([ys.reshape(-1), xs.reshape(-1)], -1)
        if special:
            pos = torch.cat([-torch.ones(1, 2, dtype=pos.dtype), pos], 0)
        return pos.unsqueeze(0).expand(b, -1, -1)

    def encode(self, img):
        x = self.patch_embed.proj(img).flatten(2).transpose(1, 2)
        pos = self.positions(img.shape[0])
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return x

    def forward(self, img1, img2):
        f1, f2 = self.encode(img1), self.encode(img2)
        B = f1.shape[0]
        pos = self.positions(B, special=True)
        tok = self.init_pose_token.expand(B, -1, -1)
        x1 = torch.cat([tok, self.decoder_embed(f1)], 1)
        x2 = torch.cat([tok, self.decoder_embed(f2)], 1)
        states1, states2 = [x1], [x2]
        for blk in self.dec_block:
            n1 = blk(states1[-1], states2[-1], pos, pos)
            n2 = blk(states2[-1], states1[-1], pos, pos)
            states1.append(n1)
            states2.append(n2)
        states1[-1] = self.dec_norm(states1[-1])
        states2[-1] = self.dec_norm(states2[-1])

        out = {}
        for tag, f, states in (("i", f1, states1), ("j", f2, states2)):
            cat = [f] + states
            hooks = [cat[h] for h in self.hooks]
            hooks = [hooks[0]] + [h[:, 1:] for h in hooks[1:]]
            raw = self.downstream_head_pts.dpt(hooks, self.grid, self.grid)
            fmap = raw.permute(0, 2, 3, 1)
            xyz = fmap[..., :3]
            d = xyz.norm(dim=-1, keepdim=True)
            out[f"pts3d_{tag}"] = xyz / d.clamp(min=1e-8) * torch.expm1(d)
            out[f"conf_{tag}"] = 1 + fmap[..., 3].exp()
            pose, conf = self.head_pose_s(states[-1][:, 0])
            out[f"pose_{tag}"] = pose
            out[f"pose_conf_{tag}"] = conf
        return out
