"""MambaVision torch-twin parity: full backbone (conv stages, windowed
attention+mixer token stages, classify head) vs a plain-torch twin.

The vendored reference module needs timm/mamba_ssm (absent here), so the twin
is assembled from public torch ops with the reference's exact semantics
(ConNexT/models/block/mamba_vision.py:1464-1962): BN eps 1e-4 stem / 1e-5
elsewhere, tanh-GELU conv blocks, SAME-padded biasless depthwise conv1d,
the dt_proj double-bias quirk, mixers-first/attention-last block order,
window partition with zero padding. State-dict naming matches the vendored
module so convert_mamba_vision consumes it directly. The selective scan is
a literal recurrence loop (mamba semantics: h = exp(dt A) h + dt x B).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SPEC = dict(dim=16, in_dim=8, depths=(1, 1, 2, 2), heads=(2, 2, 2, 2),
            window=(4, 4, 4, 2), layer_scale=1e-5)


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TAttention(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = torch.softmax(q @ k.transpose(-2, -1) / self.head_dim**0.5, dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TMixer(tnn.Module):
    def __init__(self, d_model, d_state=8, d_conv=3):
        super().__init__()
        self.d_state, self.d_conv = d_state, d_conv
        half = d_model // 2
        self.half = half
        self.dt_rank = max(1, math.ceil(d_model / 16))
        self.in_proj = tnn.Linear(d_model, d_model, bias=False)
        self.x_proj = tnn.Linear(half, self.dt_rank + 2 * d_state, bias=False)
        self.dt_proj = tnn.Linear(self.dt_rank, half, bias=True)
        self.conv1d_x = tnn.Conv1d(half, half, d_conv, groups=half, bias=False)
        self.conv1d_z = tnn.Conv1d(half, half, d_conv, groups=half, bias=False)
        self.A_log = tnn.Parameter(torch.log(
            torch.arange(1, d_state + 1, dtype=torch.float32).expand(half, d_state).contiguous()
        ))
        self.D = tnn.Parameter(torch.ones(half))
        self.out_proj = tnn.Linear(d_model, d_model, bias=False)

    def forward(self, u):
        B, L, _ = u.shape
        xz = self.in_proj(u).transpose(1, 2)  # (B, d, L)
        x, z = xz.chunk(2, dim=1)
        x = F.silu(F.conv1d(x, self.conv1d_x.weight, None, padding="same", groups=self.half))
        z = F.silu(F.conv1d(z, self.conv1d_z.weight, None, padding="same", groups=self.half))
        x_dbl = self.x_proj(x.transpose(1, 2))  # (B, L, rank+2N)
        dt, Bm, Cm = torch.split(x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1)
        # vendored quirk: dt_proj applied WITH bias, then the bias added again
        # as delta_bias inside the scan, before softplus
        dt = self.dt_proj(dt)
        dt = F.softplus(dt + self.dt_proj.bias)
        A = -torch.exp(self.A_log.float())  # (half, N)
        xt = x.transpose(1, 2)  # (B, L, half)
        h = torch.zeros(B, self.half, self.d_state)
        ys = []
        for t in range(L):
            da = torch.exp(dt[:, t, :, None] * A[None])
            h = da * h + (dt[:, t, :] * xt[:, t, :])[..., None] * Bm[:, t, None, :]
            ys.append((h * Cm[:, t, None, :]).sum(-1) + self.D * xt[:, t, :])
        y = torch.stack(ys, dim=1)  # (B, L, half)
        return self.out_proj(torch.cat([y, z.transpose(1, 2)], dim=-1))


class TBlock(tnn.Module):
    def __init__(self, dim, num_heads, use_attn, layer_scale):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.mixer = TAttention(dim, num_heads) if use_attn else TMixer(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, dim * 4)
        self.gamma_1 = tnn.Parameter(layer_scale * torch.ones(dim))
        self.gamma_2 = tnn.Parameter(layer_scale * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.mixer(self.norm1(x))
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class TConvBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(dim, dim, 3, 1, 1)
        self.norm1 = tnn.BatchNorm2d(dim, eps=1e-5)
        self.conv2 = tnn.Conv2d(dim, dim, 3, 1, 1)
        self.norm2 = tnn.BatchNorm2d(dim, eps=1e-5)

    def forward(self, x):
        h = F.gelu(self.norm1(self.conv1(x)), approximate="tanh")
        return x + self.norm2(self.conv2(h))


class TLevel(tnn.Module):
    def __init__(self, dim, depth, num_heads, window_size, conv, downsample,
                 attn_idx, layer_scale):
        super().__init__()
        self.conv_stage = conv
        self.window_size = window_size
        if conv:
            self.blocks = tnn.ModuleList([TConvBlock(dim) for _ in range(depth)])
        else:
            self.blocks = tnn.ModuleList([
                TBlock(dim, num_heads, j in attn_idx, layer_scale) for j in range(depth)
            ])
        self.downsample = None
        if downsample:
            self.downsample = tnn.Module()
            self.downsample.reduction = tnn.Sequential(
                tnn.Conv2d(dim, dim * 2, 3, 2, 1, bias=False)
            )

    def forward(self, x):
        _, C, H, W = x.shape
        if not self.conv_stage:
            ws = self.window_size
            pad_r = (ws - W % ws) % ws
            pad_b = (ws - H % ws) % ws
            if pad_r or pad_b:
                x = F.pad(x, (0, pad_r, 0, pad_b))
            _, _, Hp, Wp = x.shape
            x = x.view(-1, C, Hp // ws, ws, Wp // ws, ws)
            x = x.permute(0, 2, 4, 3, 5, 1).reshape(-1, ws * ws, C)
        for blk in self.blocks:
            x = blk(x)
        if not self.conv_stage:
            B = x.shape[0] // (Hp * Wp // ws // ws)
            x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
            x = x.permute(0, 5, 1, 3, 2, 4).reshape(B, C, Hp, Wp)
            if pad_r or pad_b:
                x = x[:, :, :H, :W].contiguous()
        if self.downsample is not None:
            x = self.downsample.reduction(x)
        return x


class TMambaVision(tnn.Module):
    def __init__(self, spec, num_classes=5):
        super().__init__()
        dim, in_dim = spec["dim"], spec["in_dim"]
        self.patch_embed = tnn.Module()
        self.patch_embed.conv_down = tnn.Sequential(
            tnn.Conv2d(3, in_dim, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(in_dim, eps=1e-4),
            tnn.ReLU(),
            tnn.Conv2d(in_dim, dim, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(dim, eps=1e-4),
            tnn.ReLU(),
        )
        self.levels = tnn.ModuleList()
        for i, d in enumerate(spec["depths"]):
            attn_idx = set(range(d // 2 + 1, d) if d % 2 else range(d // 2, d))
            self.levels.append(TLevel(
                dim * 2**i, d, spec["heads"][i], spec["window"][i],
                conv=i < 2, downsample=i < 3, attn_idx=attn_idx,
                layer_scale=spec["layer_scale"],
            ))
        nf = dim * 8
        self.norm = tnn.BatchNorm2d(nf)
        self.head = tnn.Linear(nf, num_classes)

    def forward(self, x, features_only=False):
        x = self.patch_embed.conv_down(x)
        for level in self.levels:
            x = level(x)
        if features_only:
            return x
        x = self.norm(x)
        return self.head(x.mean(dim=(2, 3)))


def test_mamba_vision_full_parity(monkeypatch):
    from mdhs_tpu.core.convert import convert_mamba_vision
    from mdhs_tpu.models import mamba_vision as mv

    monkeypatch.setitem(mv.MAMBA_VISION_SPECS, "TEST", SPEC)

    torch.manual_seed(4)
    tm = TMambaVision(SPEC).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                g = torch.Generator().manual_seed(5)
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.uniform_(-0.1, 0.1, generator=g)
                m.running_mean.uniform_(-0.1, 0.1, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)

    rng = np.random.default_rng(6)
    img = rng.normal(size=(2, 3, 30, 30)).astype(np.float32)  # odd size -> padding
    with torch.no_grad():
        ref_feat = tm(torch.tensor(img), features_only=True).numpy()  # (B, C, H, W)
        ref_logits = tm(torch.tensor(img)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_mamba_vision(sd, variant="TEST")
    model = mv.MambaVision(variant="TEST", num_classes=5, dtype=jnp.float32)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    feat = model.apply(variables, x)  # features_only default
    np.testing.assert_allclose(
        np.asarray(feat), np.transpose(ref_feat, (0, 2, 3, 1)), atol=5e-4, rtol=1e-3
    )
    logits = model.apply(variables, x, method=model.classify)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=5e-4, rtol=1e-3)


def test_mamba_vision_zoo_variants():
    """All zoo entries build; T2/L2/L3 specs present (reference :1963-2346)."""
    from mdhs_tpu.models.mamba_vision import MAMBA_VISION_SPECS

    for v in ("T", "T2", "S", "B", "L", "L2", "L2_512", "L3", "L3_512"):
        assert v in MAMBA_VISION_SPECS
    assert MAMBA_VISION_SPECS["T2"]["depths"] == (1, 3, 11, 4)
    assert MAMBA_VISION_SPECS["L2"]["depths"] == (3, 3, 12, 5)
    assert MAMBA_VISION_SPECS["L3"]["dim"] == 256


def test_mamba_vision_window_partition_roundtrip():
    from mdhs_tpu.models.mamba_vision import window_partition, window_reverse

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
