"""Full-model numeric parity: torch SegMamba -> converter -> flax SegMamba.

The torch model here is a compact test fixture reproducing the reference's
architecture and state_dict naming (/root/reference/model_segmamba/
segmamba.py:49-343, mamba/mamba_ssm/modules/mamba_simple.py:60-264) so the
converter (segmamba_tpu/utils/torch_convert.py) can be validated end to
end: random torch weights -> state_dict -> convert -> flax forward must
match the torch forward. This is the machinery that loads the published
``final_model_0.9038.pt`` checkpoint onto TPU.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from segmamba_tpu.models import SegMamba
from segmamba_tpu.utils.torch_convert import convert_segmamba_state_dict

CFG = dict(in_chans=2, out_chans=3, depths=(1, 1, 1, 1),
           feat_size=(4, 8, 16, 32), hidden_size=64,
           num_slices_list=(8, 4, 2, 1))


def _selective_scan(u, delta, A, B, C, D, z):
    """Sequential reference recurrence (selective_scan_interface.py:86-152
    semantics), f64-free, explicit loop."""
    b, L, E = u.shape
    N = A.shape[1]
    x = torch.zeros(b, E, N, dtype=u.dtype)
    dA = torch.exp(delta.unsqueeze(-1) * A)                  # (b,L,E,N)
    dBu = (delta * u).unsqueeze(-1) * B.unsqueeze(2)         # (b,L,E,N)
    ys = []
    for t in range(L):
        x = dA[:, t] * x + dBu[:, t]
        ys.append(torch.einsum("ben,bn->be", x, C[:, t]))
    y = torch.stack(ys, dim=1) + D * u
    return y * tF.silu(z)


class TriMamba(tnn.Module):
    """Tri-oriented Mamba with the reference's parameter names
    (mamba_simple.py:60-186; v3 forward :215-264)."""

    def __init__(self, d_model, d_state=16, d_conv=4, expand=2, nslices=1):
        super().__init__()
        E = expand * d_model
        R = -(-d_model // 16)
        self.E, self.R, self.N, self.ns = E, R, d_state, nslices
        self.in_proj = tnn.Linear(d_model, 2 * E, bias=False)
        self.out_proj = tnn.Linear(E, d_model, bias=False)
        for suf in ("", "_b", "_s"):
            setattr(self, f"conv1d{suf}",
                    tnn.Conv1d(E, E, d_conv, groups=E, padding=d_conv - 1))
            setattr(self, f"x_proj{suf}",
                    tnn.Linear(E, R + 2 * d_state, bias=False))
            setattr(self, f"dt_proj{suf}", tnn.Linear(R, E, bias=True))
        self.A_log = tnn.Parameter(0.3 * torch.randn(E, d_state))
        self.A_b_log = tnn.Parameter(0.3 * torch.randn(E, d_state))
        self.A_s_log = tnn.Parameter(0.3 * torch.randn(E, d_state))
        self.D = tnn.Parameter(torch.ones(E))
        self.D_b = tnn.Parameter(torch.ones(E))
        self.D_s = tnn.Parameter(torch.ones(E))

    def _direction(self, xz, suf):
        E, R, N = self.E, self.R, self.N
        x, z = xz[..., :E], xz[..., E:]
        L = x.shape[1]
        conv = getattr(self, "conv1d" + suf)
        xc = tF.silu(conv(x.transpose(1, 2))[:, :, :L].transpose(1, 2))
        db = getattr(self, "x_proj" + suf)(xc)
        delta = tF.softplus(getattr(self, "dt_proj" + suf)(db[..., :R]))
        B, C = db[..., R:R + N], db[..., R + N:]
        A = -torch.exp(getattr(self, f"A{suf}_log"))
        return _selective_scan(xc, delta, A, B, C,
                               getattr(self, "D" + suf), z)

    def forward(self, h):
        b, L, _ = h.shape
        ns = self.ns
        xz = self.in_proj(h)
        il = lambda a: a.reshape(b, ns, L // ns, -1).transpose(1, 2) \
                        .reshape(b, L, -1)
        dil = lambda a: a.reshape(b, L // ns, ns, -1).transpose(1, 2) \
                         .reshape(b, L, -1)
        out = self._direction(xz, "")
        out = out + self._direction(xz.flip(1), "_b").flip(1)
        out = out + dil(self._direction(il(xz), "_s"))
        return self.out_proj(out)


class TMambaLayer(tnn.Module):
    def __init__(self, dim, nslices):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.mamba = TriMamba(dim, nslices=nslices)

    def forward(self, x):                       # (B, C, D, H, W)
        b, c = x.shape[:2]
        dims = x.shape[2:]
        flat = x.reshape(b, c, -1).transpose(-1, -2)
        out = self.mamba(self.norm(flat))
        return out.transpose(-1, -2).reshape(b, c, *dims) + x


class TGSC(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.proj = tnn.Conv3d(c, c, 3, 1, 1)
        self.proj2 = tnn.Conv3d(c, c, 3, 1, 1)
        self.proj3 = tnn.Conv3d(c, c, 1, 1, 0)
        self.proj4 = tnn.Conv3d(c, c, 1, 1, 0)
        self.norm = tnn.InstanceNorm3d(c)

    def forward(self, x):
        cir = lambda conv, h: tF.relu(self.norm(conv(h)))
        x1 = cir(self.proj2, cir(self.proj, x))
        x2 = cir(self.proj3, x)
        return cir(self.proj4, x1 + x2) + x


class TEncoder(tnn.Module):
    def __init__(self, in_chans, dims, depths, nslices):
        super().__init__()
        self.downsample_layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Conv3d(in_chans, dims[0], 7, 2, 3))] +
            [tnn.Sequential(tnn.InstanceNorm3d(dims[i]),
                            tnn.Conv3d(dims[i], dims[i + 1], 2, 2))
             for i in range(3)])
        self.gscs = tnn.ModuleList([TGSC(d) for d in dims])
        self.stages = tnn.ModuleList(
            [tnn.Sequential(*[TMambaLayer(dims[i], nslices[i])
                              for _ in range(depths[i])])
             for i in range(4)])
        for i in range(4):
            self.add_module(f"norm{i}", tnn.InstanceNorm3d(dims[i]))
        self.mlps = tnn.ModuleList()
        for d in dims:
            m = tnn.Module()
            m.fc1 = tnn.Conv3d(d, 2 * d, 1)
            m.fc2 = tnn.Conv3d(2 * d, d, 1)
            self.mlps.append(m)

    def forward(self, x):
        outs = []
        for i in range(4):
            x = self.stages[i](self.gscs[i](self.downsample_layers[i](x)))
            h = getattr(self, f"norm{i}")(x)
            h = self.mlps[i].fc2(tF.gelu(self.mlps[i].fc1(h)))
            outs.append(h)
        return outs


class _C(tnn.Module):
    def __init__(self, cin, cout, k, s=1, bias=False):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, k, s, (k - 1) // 2, bias=bias)


class TResBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = _C(cin, cout, 3)
        self.conv2 = _C(cout, cout, 3)
        if cin != cout:
            self.conv3 = _C(cin, cout, 1)
        self.norm = tnn.InstanceNorm3d(cout)
        self.act = tnn.LeakyReLU(0.01)

    def forward(self, x):
        r = x if not hasattr(self, "conv3") else self.norm(self.conv3.conv(x))
        h = self.act(self.norm(self.conv1.conv(x)))
        h = self.norm(self.conv2.conv(h))
        return self.act(h + r)


class TBasic(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.layer = TResBlock(cin, cout)

    def forward(self, x):
        return self.layer(x)


class TUp(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.transp_conv = tnn.Module()
        self.transp_conv.conv = tnn.ConvTranspose3d(cin, cout, 2, 2,
                                                    bias=False)
        self.conv_block = TResBlock(2 * cout, cout)

    def forward(self, x, skip):
        return self.conv_block(
            torch.cat([self.transp_conv.conv(x), skip], dim=1))


class TSegMamba(tnn.Module):
    """Reference SegMamba wiring (segmamba.py:195-343)."""

    def __init__(self, in_chans, out_chans, depths, feats, hidden, nslices):
        super().__init__()
        self.vit = TEncoder(in_chans, feats, depths, nslices)
        self.encoder1 = TBasic(in_chans, feats[0])
        self.encoder2 = TBasic(feats[0], feats[1])
        self.encoder3 = TBasic(feats[1], feats[2])
        self.encoder4 = TBasic(feats[2], feats[3])
        self.encoder5 = TBasic(feats[3], hidden)
        self.decoder5 = TUp(hidden, feats[3])
        self.decoder4 = TUp(feats[3], feats[2])
        self.decoder3 = TUp(feats[2], feats[1])
        self.decoder2 = TUp(feats[1], feats[0])
        self.decoder1 = TBasic(feats[0], feats[0])
        self.out = tnn.Module()
        self.out.conv = _C(feats[0], out_chans, 1, bias=True)

    def forward(self, x_in):
        outs = self.vit(x_in)
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(outs[0])
        enc3 = self.encoder3(outs[1])
        enc4 = self.encoder4(outs[2])
        hidden = self.encoder5(outs[3])
        d = self.decoder5(hidden, enc4)
        d = self.decoder4(d, enc3)
        d = self.decoder3(d, enc2)
        d = self.decoder2(d, enc1)
        return self.out.conv.conv(self.decoder1(d))


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    tm = TSegMamba(CFG["in_chans"], CFG["out_chans"], CFG["depths"],
                   CFG["feat_size"], CFG["hidden_size"],
                   CFG["num_slices_list"]).eval()
    fm = SegMamba(scan_impl="ref", **CFG)
    params = convert_segmamba_state_dict(tm.state_dict(),
                                         depths=CFG["depths"])
    return tm, fm, params


def test_converted_tree_structure(tiny_pair):
    """Converted tree must match the flax init tree exactly (paths+shapes)."""
    tm, fm, params = tiny_pair
    x = jnp.zeros((1, 32, 32, 32, CFG["in_chans"]))
    want = fm.init(jax.random.key(0), x)
    fw = jax.tree_util.tree_flatten_with_path(want)[0]
    fg = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(jnp.asarray, params))[0]
    paths_w = [(tuple(str(k.key) for k in p), tuple(v.shape)) for p, v in fw]
    paths_g = [(tuple(str(k.key) for k in p), tuple(np.shape(v)))
               for p, v in fg]
    assert sorted(paths_g) == sorted(paths_w)


def test_full_model_forward_parity(tiny_pair):
    """Torch forward == flax forward through the converter (f32, <=1e-2)."""
    tm, fm, params = tiny_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, CFG["in_chans"], 32, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()          # (1, K, 16,16,16)
    x_flax = jnp.asarray(np.moveaxis(x, 1, -1))
    got = np.moveaxis(np.asarray(fm.apply(params, x_flax)), -1, 1)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-2 * scale)


def test_rejects_unknown_entries():
    sd = {"vit.downsample_layers.0.0.weight": np.zeros((4, 2, 7, 7, 7)),
          "unexpected.weight": np.zeros(3)}
    with pytest.raises(Exception):
        convert_segmamba_state_dict(sd, depths=(1, 1, 1, 1))
