"""FID InceptionV3 architecture oracle (VERDICT r2 #4).

The reference FID net (metrics/pytorch_fid/inception.py:184-211) is
torchvision's InceptionV3 with three patches: count_include_pad=False
average pools in A/C/E_1 branches, a MAX pool branch in E_2, and 1008
classes (irrelevant to pool3). torchvision is not installed here, so this
test carries an INDEPENDENT functional torch oracle — plain
F.conv2d/F.batch_norm/F.avg_pool2d in NCHW with the strides/paddings of
the torchvision blocks written out explicitly — evaluated from a
fabricated pt_inception-format state dict. Our flax FIDInceptionV3 +
load_torch_weights must reproduce its pool3 features for ANY weights,
which pins the architecture (a wrong stride/pool/pad fails loudly), the
same guarantee VGG/AlexNet/LPIPS already have.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional


# ------------------------------------------------------------- state dict
def _fabricate_state(params, rng):
    """Walk the flax tree and emit a pt_inception-style state dict with
    random-but-valid tensors (conv OIHW; bn affine + running stats)."""
    state = {}

    def walk(p, b, prefix):
        if "conv" in p and "kernel" in p["conv"]:
            k = np.asarray(p["conv"]["kernel"])  # HWIO
            o = k.shape[3]
            state[prefix + ".conv.weight"] = (
                rng.randn(*k.transpose(3, 2, 0, 1).shape).astype(np.float32) * 0.1
            )
            state[prefix + ".bn.weight"] = (
                1.0 + 0.1 * rng.randn(o).astype(np.float32)
            )
            state[prefix + ".bn.bias"] = 0.1 * rng.randn(o).astype(np.float32)
            state[prefix + ".bn.running_mean"] = (
                0.05 * rng.randn(o).astype(np.float32)
            )
            state[prefix + ".bn.running_var"] = (
                0.5 + np.abs(rng.randn(o)).astype(np.float32)
            )
            return
        for key, v in p.items():
            walk(v, b.get(key, {}), f"{prefix}.{key}" if prefix else key)

    walk(params["params"], params["batch_stats"], "")
    return state


# ------------------------------------------------------------ torch oracle
class _Oracle:
    """Functional NCHW evaluator of the FID InceptionV3 pool3 path."""

    def __init__(self, state):
        self.s = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}

    def bconv(self, x, name, stride=1, pad=0):
        x = F.conv2d(x, self.s[f"{name}.conv.weight"], stride=stride, padding=pad)
        x = F.batch_norm(
            x, self.s[f"{name}.bn.running_mean"], self.s[f"{name}.bn.running_var"],
            self.s[f"{name}.bn.weight"], self.s[f"{name}.bn.bias"],
            training=False, eps=0.001,
        )
        return F.relu(x)

    def avg_fid(self, x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    def inception_a(self, x, n):
        b1 = self.bconv(x, f"{n}.branch1x1")
        b5 = self.bconv(x, f"{n}.branch5x5_1")
        b5 = self.bconv(b5, f"{n}.branch5x5_2", pad=2)
        bd = self.bconv(x, f"{n}.branch3x3dbl_1")
        bd = self.bconv(bd, f"{n}.branch3x3dbl_2", pad=1)
        bd = self.bconv(bd, f"{n}.branch3x3dbl_3", pad=1)
        bp = self.bconv(self.avg_fid(x), f"{n}.branch_pool")
        return torch.cat([b1, b5, bd, bp], 1)

    def inception_b(self, x, n):
        b3 = self.bconv(x, f"{n}.branch3x3", stride=2)
        bd = self.bconv(x, f"{n}.branch3x3dbl_1")
        bd = self.bconv(bd, f"{n}.branch3x3dbl_2", pad=1)
        bd = self.bconv(bd, f"{n}.branch3x3dbl_3", stride=2)
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)

    def inception_c(self, x, n):
        b1 = self.bconv(x, f"{n}.branch1x1")
        b7 = self.bconv(x, f"{n}.branch7x7_1")
        b7 = self.bconv(b7, f"{n}.branch7x7_2", pad=(0, 3))
        b7 = self.bconv(b7, f"{n}.branch7x7_3", pad=(3, 0))
        bd = self.bconv(x, f"{n}.branch7x7dbl_1")
        bd = self.bconv(bd, f"{n}.branch7x7dbl_2", pad=(3, 0))
        bd = self.bconv(bd, f"{n}.branch7x7dbl_3", pad=(0, 3))
        bd = self.bconv(bd, f"{n}.branch7x7dbl_4", pad=(3, 0))
        bd = self.bconv(bd, f"{n}.branch7x7dbl_5", pad=(0, 3))
        bp = self.bconv(self.avg_fid(x), f"{n}.branch_pool")
        return torch.cat([b1, b7, bd, bp], 1)

    def inception_d(self, x, n):
        b3 = self.bconv(x, f"{n}.branch3x3_1")
        b3 = self.bconv(b3, f"{n}.branch3x3_2", stride=2)
        b7 = self.bconv(x, f"{n}.branch7x7x3_1")
        b7 = self.bconv(b7, f"{n}.branch7x7x3_2", pad=(0, 3))
        b7 = self.bconv(b7, f"{n}.branch7x7x3_3", pad=(3, 0))
        b7 = self.bconv(b7, f"{n}.branch7x7x3_4", stride=2)
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)

    def inception_e(self, x, n, pool):
        b1 = self.bconv(x, f"{n}.branch1x1")
        b3 = self.bconv(x, f"{n}.branch3x3_1")
        b3 = torch.cat([
            self.bconv(b3, f"{n}.branch3x3_2a", pad=(0, 1)),
            self.bconv(b3, f"{n}.branch3x3_2b", pad=(1, 0)),
        ], 1)
        bd = self.bconv(x, f"{n}.branch3x3dbl_1")
        bd = self.bconv(bd, f"{n}.branch3x3dbl_2", pad=1)
        bd = torch.cat([
            self.bconv(bd, f"{n}.branch3x3dbl_3a", pad=(0, 1)),
            self.bconv(bd, f"{n}.branch3x3dbl_3b", pad=(1, 0)),
        ], 1)
        if pool == "max":
            # FIDInceptionE_2 patch (inception.py:302-306)
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = self.avg_fid(x)
        bp = self.bconv(bp, f"{n}.branch_pool")
        return torch.cat([b1, b3, bd, bp], 1)

    def pool3(self, x):
        x = 2.0 * x - 1.0
        x = self.bconv(x, "Conv2d_1a_3x3", stride=2)
        x = self.bconv(x, "Conv2d_2a_3x3")
        x = self.bconv(x, "Conv2d_2b_3x3", pad=1)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.bconv(x, "Conv2d_3b_1x1")
        x = self.bconv(x, "Conv2d_4a_3x3")
        x = F.max_pool2d(x, 3, stride=2)
        x = self.inception_a(x, "Mixed_5b")
        x = self.inception_a(x, "Mixed_5c")
        x = self.inception_a(x, "Mixed_5d")
        x = self.inception_b(x, "Mixed_6a")
        x = self.inception_c(x, "Mixed_6b")
        x = self.inception_c(x, "Mixed_6c")
        x = self.inception_c(x, "Mixed_6d")
        x = self.inception_c(x, "Mixed_6e")
        x = self.inception_d(x, "Mixed_7a")
        x = self.inception_e(x, "Mixed_7b", "avg")
        x = self.inception_e(x, "Mixed_7c", "max")
        return x.mean(dim=(2, 3))


def test_fid_inception_pool3_architecture_parity():
    from hoig_tpu.metrics.inception import FIDInceptionV3, load_torch_weights

    rng = np.random.RandomState(0)
    # 75px input: every stride/pool still reduces a nontrivial grid
    # (75 -> 37 -> 35 -> 35 -> 17 -> 15 -> 7 -> 3 -> 1) without paying the
    # full 299px CPU cost; resize_input=False isolates the conv path
    x = rng.rand(2, 75, 75, 3).astype(np.float32)

    model = FIDInceptionV3(resize_input=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    state = _fabricate_state(jax.tree.map(np.asarray, params), rng)
    # key-name spot checks: the fabricated dict speaks pt_inception
    assert "Conv2d_1a_3x3.conv.weight" in state
    assert "Mixed_7c.branch_pool.bn.running_var" in state
    assert state["Mixed_5b.branch_pool.conv.weight"].shape == (32, 192, 1, 1)

    params = load_torch_weights(params, state)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(model.apply(params, jnp.asarray(x)))

    with torch.no_grad():
        theirs = _Oracle(state).pool3(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()
    assert ours.shape == theirs.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
