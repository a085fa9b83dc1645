

def test_interleaved_gae_matches_reference_transcription():
    """A2C_INTERLEAVED_GAE runs the advantage recursion over the flat
    interleaved buffer exactly like the reference's `compute_gae`
    (`rl_a2c.py:183-192`), skipping padded group slots the reference
    never stores."""
    import numpy as np
    import jax.numpy as jnp
    from trafficsimulation_tpu.rl.controllers import interleaved_gae

    rng = np.random.default_rng(0)
    R, G = 6, 5
    gamma, lam = 0.8, 0.75
    r = rng.normal(size=(R, G)).astype(np.float32)
    v = rng.normal(size=(R, G)).astype(np.float32)
    m = rng.random((R, G)) < 0.8
    m[:, 0] = True

    # reference transcription: python loop over the stored-only entries
    rs, vs, pos = [], [], []
    for t in range(R):
        for g in range(G):
            if m[t, g]:
                rs.append(r[t, g])
                vs.append(v[t, g])
                pos.append((t, g))
    adv_ref = np.zeros(len(rs), dtype=np.float64)
    gae, next_v = 0.0, 0.0
    for i in reversed(range(len(rs))):
        delta = rs[i] + gamma * next_v - vs[i]
        gae = delta + gamma * lam * gae
        adv_ref[i] = gae
        next_v = vs[i]
    want = np.zeros((R, G), np.float32)
    for i, (t, g) in enumerate(pos):
        want[t, g] = adv_ref[i]

    got = np.asarray(interleaved_gae(
        gamma, lam, jnp.asarray(r.reshape(-1)), jnp.asarray(v.reshape(-1)),
        jnp.asarray(m.reshape(-1)))).reshape(R, G)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
