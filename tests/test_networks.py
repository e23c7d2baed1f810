"""Network-module unit suite: output shapes/dtypes, noisy-layer semantics,
ensemble independence, dueling identities, quantile-net invariants, conv
layout handling and the bf16 mixed-precision path (the flax counterparts of
reference ``test/base/test_utils.py`` net checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.networks.common import (
    MLP,
    BranchingQNet,
    DuelingQNet,
    EnsembleMLP,
    QNet,
    QNetEnsemble,
    RecurrentQNet,
)
from tianshou_tpu.networks.continuous import (
    VAE,
    CriticEnsemble,
    GaussianActor,
    Perturbation,
)
from tianshou_tpu.networks.conv import ConvDuelingQNet, ConvQNet
from tianshou_tpu.networks.discrete import (
    C51Net,
    FractionProposalNetwork,
    FullQuantileFunction,
    ImplicitQuantileNetwork,
    NoisyLinear,
    QRDQNNet,
)

K = jax.random.key(0)
OBS = jnp.ones((5, 7))


def test_mlp_bf16_compute_keeps_f32_boundary():
    net = MLP((16, 16), 3, compute_dtype=jnp.bfloat16)
    p = net.init(K, OBS)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(p))
    out = net.apply(p, OBS)
    assert out.dtype == jnp.float32 and out.shape == (5, 3)
    # bf16 quantization must actually happen in the middle (outputs differ
    # from the pure-f32 net with identical params)
    net32 = MLP((16, 16), 3)
    out32 = net32.apply(p, OBS * 1.2345)
    outbf = net.apply(p, OBS * 1.2345)
    assert not np.allclose(np.asarray(out32), np.asarray(outbf), atol=0)


def test_dueling_identity():
    """Q = V + A - mean(A) implies mean_a Q(s, a) == V(s)."""
    net = DuelingQNet((16,), 4)
    p = net.init(K, OBS)
    q = net.apply(p, OBS)
    assert q.shape == (5, 4)
    # advantage centering: subtracting the per-state mean leaves zero-mean
    # advantage, so Q's action-mean equals the (unobservable) V; check the
    # algebraic consequence mean_a(Q - mean_a Q) == 0
    centered = q - q.mean(axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(centered.mean(-1)), 0.0, atol=1e-6)


def test_ensembles_have_independent_members():
    for net, args, member_axis in [
        (QNetEnsemble((16,), 3, num_critics=4), (OBS,), 0),
        (EnsembleMLP(4, (16,), 2), (OBS,), 0),
        (CriticEnsemble((16,), num_critics=4), (OBS, jnp.ones((5, 2))), 0),
    ]:
        p = net.init(K, *args)
        out = np.asarray(net.apply(p, *args))
        members = [np.take(out, i, axis=member_axis) for i in range(4)]
        for a, b in zip(members, members[1:]):
            assert not np.allclose(a, b), type(net).__name__


def test_branching_qnet_shape():
    net = BranchingQNet((16,), num_branches=3, actions_per_branch=5)
    p = net.init(K, OBS)
    assert net.apply(p, OBS).shape == (5, 3, 5)


def test_recurrent_qnet_carry():
    net = RecurrentQNet(hidden_size=8, num_actions=2)
    carry = net.init_carry(5)
    p = net.init(K, OBS, carry)
    q1, carry1 = net.apply(p, OBS, carry)
    assert q1.shape == (5, 2)
    assert carry1[0].shape == (5, 8)
    # state matters: same obs with evolved carry gives different output
    q2, _ = net.apply(p, OBS, carry1)
    assert not np.allclose(np.asarray(q1), np.asarray(q2))


def test_noisy_linear_eval_deterministic_train_stochastic():
    net = NoisyLinear(4)
    p = net.init(K, OBS)
    # evaluation path: mean weights only, no rng needed, deterministic
    e1 = net.apply(p, OBS, False)
    e2 = net.apply(p, OBS, False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # noisy path draws per-call factorized noise
    n1 = net.apply(p, OBS, True, rngs={"noise": jax.random.key(1)})
    n2 = net.apply(p, OBS, True, rngs={"noise": jax.random.key(2)})
    assert not np.allclose(np.asarray(n1), np.asarray(n2))
    assert not np.allclose(np.asarray(n1), np.asarray(e1))


def test_c51_outputs_distributions():
    net = C51Net((16,), num_actions=3, num_atoms=11)
    p = net.init(K, OBS, False)
    logits = net.apply(p, OBS, False)
    assert logits.shape == (5, 3, 11)
    probs = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_qrdqn_and_iqn_shapes():
    net = QRDQNNet((16,), num_actions=3, num_quantiles=8)
    p = net.init(K, OBS)
    assert net.apply(p, OBS).shape == (5, 3, 8)
    iqn = ImplicitQuantileNetwork((16,), num_actions=3)
    taus = jnp.linspace(0.05, 0.95, 7)[None].repeat(5, 0)
    p = iqn.init(K, OBS, taus)
    assert iqn.apply(p, OBS, taus).shape == (5, 7, 3)


def test_fraction_proposal_valid_fractions():
    fpn = FractionProposalNetwork(num_fractions=16)
    feat = jnp.ones((5, 32))
    p = fpn.init(K, feat)
    taus, tau_hats, entropy = fpn.apply(p, feat)
    taus = np.asarray(taus)
    assert taus.shape == (5, 17)
    np.testing.assert_allclose(taus[:, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(taus[:, -1], 1.0, rtol=1e-5)
    assert (np.diff(taus, axis=1) >= -1e-7).all()  # monotone
    th = np.asarray(tau_hats)
    assert ((th > 0) & (th < 1)).all()
    assert (np.asarray(entropy) > 0).all()


def test_full_quantile_function_feature_method():
    fqf = FullQuantileFunction((16, 16), num_actions=4)
    taus = jnp.linspace(0.1, 0.9, 6)[None].repeat(5, 0)
    p = fqf.init(K, OBS, taus)
    feat = fqf.apply(p, OBS, method="features")
    assert feat.shape == (5, 16)
    q = fqf.apply(p, OBS, taus)
    assert q.shape == (5, 6, 4)


def test_gaussian_actor_sigma_init_and_clamp():
    net = GaussianActor((16,), 2, sigma_init=-0.5)
    p = net.init(K, OBS)
    mu, sigma = net.apply(p, OBS)
    np.testing.assert_allclose(np.asarray(sigma), np.exp(-0.5), rtol=1e-5)
    # conditioned sigma stays within the clamp bounds
    net2 = GaussianActor((16,), 2, conditioned_sigma=True)
    p2 = net2.init(K, OBS * 100)
    _, sigma2 = net2.apply(p2, OBS * 100)
    s = np.asarray(sigma2)
    assert (s >= np.exp(-20) - 1e-12).all() and (s <= np.exp(2) + 1e-3).all()


def test_perturbation_bounded():
    net = Perturbation((16,), 2, max_action=1.0, phi=0.05)
    act = jnp.full((5, 2), 0.99)
    p = net.init(K, OBS, act)
    out = np.asarray(net.apply(p, OBS, act))
    assert (np.abs(out) <= 1.0 + 1e-6).all()
    # adjustment is at most phi * max_action
    assert (np.abs(out - np.asarray(act)) <= 0.05 + 1e-6).all()


def test_vae_roundtrip_shapes():
    net = VAE((16,), action_dim=2, latent_dim=3)
    act = jnp.zeros((5, 2))
    p = net.init(K, OBS, act, jax.random.key(1))
    recon, mean, log_std = net.apply(p, OBS, act, jax.random.key(2))
    assert recon.shape == (5, 2) and mean.shape == (5, 3)
    dec = net.apply(p, OBS, None, jax.random.key(3), method="decode")
    assert dec.shape == (5, 2)
    assert (np.abs(np.asarray(dec)) <= 1.0).all()


def test_conv_nets_accept_nchw_and_output_f32():
    obs = jnp.ones((3, 4, 10, 10))  # [B, C, H, W] MinAtar-style
    for net in (ConvQNet(num_actions=6, encoder="minatar"),
                ConvDuelingQNet(num_actions=6, encoder="minatar")):
        p = net.init(K, obs)
        out = net.apply(p, obs)
        assert out.shape == (3, 6)
        assert out.dtype == jnp.float32
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(p))
