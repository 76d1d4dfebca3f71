"""Numerical parity of the JAX heads vs the reference torch implementation.

The reference ``classifier_head.py`` is imported directly from
/root/reference and run on CPU with identical weights; JAX eval outputs must
match to float32 tolerance. This is the hard gate for artifact compatibility:
a model bundle trained by either implementation must predict identically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cbas_tpu.models.heads import (
    DeltasHeadConfig,
    LegacyHeadConfig,
    deltas_forward,
    infer_deltas_hparams,
    init_deltas_params,
    legacy_forward_nodrop,
)
from cbas_tpu.models.lstm import lstm_forward
from cbas_tpu.models.torch_port import params_to_state_dict, state_dict_to_params
from cbas_tpu.ops.ema import robust_deltas
from tests.conftest import load_reference_module

ref_heads = load_reference_module("classifier_head")

TOL = dict(rtol=2e-5, atol=2e-5)


def to_jax(sd):
    return {k: jnp.asarray(v) for k, v in state_dict_to_params(sd).items()}


@pytest.mark.parametrize("hidden,layers,seq_len", [(64, 1, 31), (128, 2, 63)])
def test_lstm_matches_torch(hidden, layers, seq_len):
    torch.manual_seed(0)
    m = torch.nn.LSTM(32, hidden, num_layers=layers, batch_first=True, bidirectional=True)
    x = torch.randn(4, seq_len, 32)
    with torch.no_grad():
        want, _ = m(x)
    params = {f"lstm.{k}": jnp.asarray(v.detach().numpy()) for k, v in m.state_dict().items()}
    got = lstm_forward(params, jnp.asarray(x.numpy()), hidden, layers)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


@pytest.mark.parametrize("T", [2, 3, 31])
def test_robust_deltas_matches_torch(T):
    torch.manual_seed(1)
    ref = ref_heads.ClassifierLSTMDeltas(in_features=16, out_features=3, seq_len=max(T, 5))
    x = torch.randn(2, T, 16)
    with torch.no_grad():
        w_s, w_d, w_a = ref._calculate_robust_deltas(x)
    g_s, g_d, g_a = robust_deltas(jnp.asarray(x.numpy()), ref.ema_alpha)
    np.testing.assert_allclose(np.asarray(g_s), w_s.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(g_d), w_d.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(g_a), w_a.numpy(), **TOL)


@pytest.mark.parametrize(
    "hidden,layers,seq_len,use_acc",
    [(64, 1, 31, True), (128, 2, 63, True), (64, 1, 31, False)],
)
def test_deltas_head_matches_torch_eval(hidden, layers, seq_len, use_acc):
    torch.manual_seed(42)
    ref = ref_heads.ClassifierLSTMDeltas(
        in_features=768,
        out_features=5,
        seq_len=seq_len,
        lstm_hidden_size=hidden,
        lstm_layers=layers,
        use_acceleration=use_acc,
    ).eval()
    x = torch.randn(3, seq_len, 768)
    with torch.no_grad():
        want_logits, want_latent = ref(x)

    cfg = DeltasHeadConfig(
        out_features=5,
        seq_len=seq_len,
        lstm_hidden_size=hidden,
        lstm_layers=layers,
        use_acceleration=use_acc,
    )
    params = to_jax(ref.state_dict())
    got_logits, got_latent = deltas_forward(params, jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(got_latent), want_latent.numpy(), **TOL)


def test_deltas_head_jit_and_grad():
    cfg = DeltasHeadConfig(out_features=4, seq_len=31)
    params = init_deltas_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 31, 768))

    fwd = jax.jit(lambda p, x: deltas_forward(p, x, cfg)[0])
    logits = fwd(params, x)
    assert logits.shape == (2, 4)

    def loss(p):
        return deltas_forward(p, x, cfg)[0].sum()

    grads = jax.grad(loss)(params)
    assert grads["gate"].shape == ()
    assert float(jnp.abs(grads["lin1.weight"]).sum()) > 0


def test_deltas_train_mode_dropout_active():
    cfg = DeltasHeadConfig(out_features=3, seq_len=31)
    params = init_deltas_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 31, 768))
    a, _ = deltas_forward(params, x, cfg, train=True, rng=jax.random.key(2))
    b, _ = deltas_forward(params, x, cfg, train=True, rng=jax.random.key(3))
    c, _ = deltas_forward(params, x, cfg, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_legacy_head_matches_torch_eval():
    torch.manual_seed(7)
    ref = ref_heads.ClassifierLegacyLSTM(in_features=768, out_features=4, seq_len=31)
    # Give batch norm non-trivial running stats.
    with torch.no_grad():
        ref.batch_norm.running_mean.uniform_(-0.5, 0.5)
        ref.batch_norm.running_var.uniform_(0.5, 1.5)
    ref.eval()
    x = torch.randn(3, 31, 768)
    with torch.no_grad():
        want = ref.forward_nodrop(x)

    cfg = LegacyHeadConfig(out_features=4, seq_len=31)
    got = legacy_forward_nodrop(to_jax(ref.state_dict()), jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_init_params_load_into_torch_model():
    """Freshly-initialized JAX params form a valid torch checkpoint."""
    cfg = DeltasHeadConfig(out_features=6, seq_len=31, lstm_hidden_size=128, lstm_layers=2)
    params = init_deltas_params(jax.random.key(0), cfg)
    sd = params_to_state_dict({k: np.asarray(v) for k, v in params.items()})
    ref = ref_heads.ClassifierLSTMDeltas(
        in_features=768, out_features=6, seq_len=31, lstm_hidden_size=128, lstm_layers=2
    )
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    x = torch.randn(2, 31, 768)
    ref.eval()
    with torch.no_grad():
        want, _ = ref(x)
    got, _ = deltas_forward(params, jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), **TOL)


def test_infer_hparams_from_shapes():
    cfg = DeltasHeadConfig(out_features=3, lstm_hidden_size=128, lstm_layers=2)
    params = init_deltas_params(jax.random.key(0), cfg)
    assert infer_deltas_hparams(params) == {"lstm_hidden_size": 128, "lstm_layers": 2}
