"""RL traffic-light controllers: REINFORCE (NEIGHBOR_RL*), A2C, GAT-DQN.

Each controller is a pure function
    (train_state, world pieces, key) -> (train_state', want, phase_req)
whose (want, phase_req) plugs into `fsm.run_controllers` exactly where
the FSM controllers call `apply_phase`.  All groups act in one batched
forward pass (MXU matmuls) — the TPU-native form of the reference's
batched modes (`run_batched_rl_control` `rl_simple.py:205-261`,
`run_a2c_control` `rl_a2c.py:101-178`, `run_batched_gat_dqn_control`
`rl_gatdqn.py:259-338`).

Shared phase mechanics (`rl_simple.py:149-199`, `rl_gatdqn.py:195-215`):
  rl_timer += 1; request apply_phase(rl_phase) when rl_timer == 1;
  action 1 with rl_timer >= min_green toggles rl_phase and resets.

Parity notes:
* the reference's REINFORCE reward `-(pressure_ns + pressure_ew)` is
  identically zero (cross pressures cancel, `rl_simple.py:54-58,183`);
  we implement the evident intent, -(local_ns + local_ew), the queue
  penalty the A2C controller uses (`rl_a2c.py:160-164`).
* A2C's GAE runs per group along time (the reference interleaves all
  intersections into one trajectory, `rl_a2c.py:236-252`).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from .nets import PolicyMLP, ActorCritic, GATQNet
from . import features

RL_PHASE_MIN_GREEN = {
    "NEIGHBOR_RL": "SRL_MIN_GREEN", "NEIGHBOR_RL_BATCHED": "SRL_MIN_GREEN",
    "RL_A2C_BATCHED": "TRAFFIC_LIGHT_PRESSURE_CONTROL_MIN_GREEN",
    "GAT_DQN": "GAT_TRAFFIC_RL_MIN_GREEN",
    "GAT_DQN_BATCHED": "GAT_TRAFFIC_RL_MIN_GREEN",
}


@struct.dataclass
class SRLTrain:
    params: Any
    opt_state: Any
    buf_s: jnp.ndarray     # [CAP, DIM]
    buf_a: jnp.ndarray     # [CAP]
    buf_r: jnp.ndarray     # [CAP]
    cursor: jnp.ndarray    # i32 write position
    filled: jnp.ndarray    # i32 number of valid rows
    since_train: jnp.ndarray


@struct.dataclass
class A2CTrain:
    params: Any
    opt_state: Any
    roll_s: jnp.ndarray    # [R, G, DIM]
    roll_a: jnp.ndarray    # [R, G]
    roll_r: jnp.ndarray    # [R, G]
    roll_v: jnp.ndarray    # [R, G]
    roll_m: jnp.ndarray    # [R, G] valid mask
    t: jnp.ndarray         # i32 rollout cursor
    global_step: jnp.ndarray


@struct.dataclass
class GATTrain:
    params: Any
    target_params: Any
    opt_state: Any
    buf_s: jnp.ndarray     # [CAP, 5, 9]
    buf_m: jnp.ndarray     # [CAP, 5]
    buf_a: jnp.ndarray     # [CAP]
    buf_r: jnp.ndarray     # [CAP]
    buf_ns: jnp.ndarray    # [CAP, 5, 9]
    buf_nm: jnp.ndarray    # [CAP, 5]
    cursor: jnp.ndarray
    filled: jnp.ndarray
    epsilon: jnp.ndarray   # f32 [G]
    train_steps: jnp.ndarray
    # pending (s, a) awaiting its next-state: the reference completes a
    # transition at the controller's NEXT invocation, when the post-
    # action occupancy is observable (`rl_gatdqn.py:217-241`)
    pend_s: jnp.ndarray    # [G, 5, 9]
    pend_m: jnp.ndarray    # [G, 5]
    pend_a: jnp.ndarray    # [G]
    pend_valid: jnp.ndarray  # [G] bool


def _optimizer(lr):
    return optax.adam(lr)


def init_rl_state(cfg: Config, num_groups: int, key) -> Optional[Any]:
    algo = cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM
    G = num_groups
    if algo in ("NEIGHBOR_RL", "NEIGHBOR_RL_BATCHED"):
        dim = cfg.SRL_INPUT_DIMENSIONS
        net = PolicyMLP(cfg.SRL_HIDDEN_LAYER_SIZE, cfg.SRL_HIDDEN_LAYERS)
        params = net.init(key, jnp.zeros((1, dim)))
        opt = _optimizer(cfg.SRL_LEARNING_RATE)
        cap = max(4 * cfg.SRL_BATCH_SIZE, 2 * G)
        return SRLTrain(
            params=params, opt_state=opt.init(params),
            buf_s=jnp.zeros((cap, dim)), buf_a=jnp.zeros((cap,), jnp.int32),
            buf_r=jnp.zeros((cap,)), cursor=jnp.int32(0),
            filled=jnp.int32(0), since_train=jnp.int32(0))
    if algo == "RL_A2C_BATCHED":
        dim = 13
        net = ActorCritic(cfg.A2C_HIDDEN_LAYER_SIZE, cfg.A2C_HIDDEN_LAYERS)
        params = net.init(key, jnp.zeros((1, dim)))
        opt = _optimizer(cfg.SRL_LEARNING_RATE)
        R = cfg.A2C_UPDATE_EVERY
        return A2CTrain(
            params=params, opt_state=opt.init(params),
            roll_s=jnp.zeros((R, G, dim)), roll_a=jnp.zeros((R, G), jnp.int32),
            roll_r=jnp.zeros((R, G)), roll_v=jnp.zeros((R, G)),
            roll_m=jnp.zeros((R, G), bool), t=jnp.int32(0),
            global_step=jnp.int32(0))
    if algo in ("GAT_DQN", "GAT_DQN_BATCHED"):
        net = GATQNet()
        params = net.init(key, jnp.zeros((1, 5, 9)), jnp.zeros((1, 5)))
        opt = _optimizer(1e-3)
        cap = cfg.GAT_MEMORY_CAPACITY
        return GATTrain(
            params=params, target_params=params, opt_state=opt.init(params),
            buf_s=jnp.zeros((cap, 5, 9)), buf_m=jnp.zeros((cap, 5)),
            buf_a=jnp.zeros((cap,), jnp.int32), buf_r=jnp.zeros((cap,)),
            buf_ns=jnp.zeros((cap, 5, 9)), buf_nm=jnp.zeros((cap, 5)),
            cursor=jnp.int32(0), filled=jnp.int32(0),
            epsilon=jnp.full((G,), cfg.EPS_INITIAL),
            train_steps=jnp.int32(0),
            pend_s=jnp.zeros((G, 5, 9)), pend_m=jnp.zeros((G, 5)),
            pend_a=jnp.zeros((G,), jnp.int32),
            pend_valid=jnp.zeros((G,), bool))
    return None


def interleaved_gae(gamma: float, lam: float, r, v, m):
    """GAE over one FLAT interleaved pseudo-trajectory (the reference's
    `compute_gae` `rl_a2c.py:183-192` over BUFFER storage order).
    `m` masks padded group slots: the reference never stores them, so
    the (gae, next_v) chain passes through masked entries unchanged and
    their advantage is 0.  Oracle-tested in tests/test_rl.py."""
    import jax
    import jax.numpy as jnp

    def scan(carry, x):
        gae, next_v = carry
        r_t, v_t, m_t = x
        delta = r_t + gamma * next_v - v_t
        g2 = delta + gamma * lam * gae
        gae = jnp.where(m_t, g2, gae)
        next_v = jnp.where(m_t, v_t, next_v)
        return (gae, next_v), jnp.where(m_t, g2, 0.0)

    (_, _), adv = jax.lax.scan(
        scan, (jnp.float32(0.0), jnp.float32(0.0)),
        (r.astype(jnp.float32), v.astype(jnp.float32), m.astype(bool)),
        reverse=True)
    return adv


def _phase_mechanics(cfg: Config, lights, active, action, min_green):
    """Shared rl_timer / rl_phase bookkeeping.  Returns (lights',
    want_apply, phase_req)."""
    timer = jnp.where(active, lights.rl_timer + 1, lights.rl_timer)
    want = active & (timer == 1)
    phase_req = lights.ft_phase
    toggle = active & (action == 1) & (timer >= min_green)
    new_phase = jnp.where(toggle, 1 - lights.ft_phase, lights.ft_phase)
    timer = jnp.where(toggle, 0, timer)
    lights = lights.replace(rl_timer=timer, ft_phase=new_phase)
    return lights, want, phase_req


def _ring_write(buf, cursor, vals, n):
    """Write n rows into a ring buffer at cursor (wrapping)."""
    cap = buf.shape[0]
    idx = (cursor + jnp.arange(n)) % cap
    return buf.at[idx].set(vals)


# ---------------------------------------------------------------------------
# REINFORCE (NEIGHBOR_RL / NEIGHBOR_RL_BATCHED)
# ---------------------------------------------------------------------------

def srl_step(cfg: Config, ts: SRLTrain, grid, gs, lights, occupancy,
             stuck_map, key):
    G = gs.valid.shape[0]
    net = PolicyMLP(cfg.SRL_HIDDEN_LAYER_SIZE, cfg.SRL_HIDDEN_LAYERS)
    opt = _optimizer(cfg.SRL_LEARNING_RATE)
    k_act, k_samp = jax.random.split(key)

    s = features.srl_state(cfg, grid, gs, lights, occupancy, stuck_map)
    logits = net.apply(ts.params, s)
    action = jax.random.categorical(k_act, logits, axis=-1)
    active = gs.valid & (lights.pending_phase == -1)
    lights, want, phase_req = _phase_mechanics(
        cfg, lights, active, action, cfg.SRL_MIN_GREEN)

    # reward: -(queue) [+ stuck penalty]  (intended semantics; see module
    # docstring on the reference's zero cross-pressure reward)
    ln, le = features.group_flows(grid, occupancy, G)
    neg = ln + le
    if cfg.SRL_PUNISH_STUCK:
        sn, se = features.group_flows(grid, stuck_map, G)
        neg = neg + (sn + se) * cfg.SRL_PUNISH_STUCK_FACTOR
    reward = -neg

    # store transitions for all valid groups
    cap = ts.buf_s.shape[0]
    idx = (ts.cursor + jnp.arange(G)) % cap
    put = gs.valid
    widx = jnp.where(put, idx, cap)  # cap row dropped
    ts = ts.replace(
        buf_s=ts.buf_s.at[widx].set(s, mode="drop"),
        buf_a=ts.buf_a.at[widx].set(action.astype(jnp.int32), mode="drop"),
        buf_r=ts.buf_r.at[widx].set(reward, mode="drop"),
        cursor=(ts.cursor + jnp.sum(put)) % cap,
        filled=jnp.minimum(ts.filled + jnp.sum(put), cap),
        since_train=ts.since_train + jnp.sum(put))

    def train(ts):
        bidx = jax.random.randint(k_samp, (cfg.SRL_BATCH_SIZE,), 0,
                                  jnp.maximum(ts.filled, 1))
        bs, ba, br = ts.buf_s[bidx], ts.buf_a[bidx], ts.buf_r[bidx]

        def loss_fn(p):
            lg = net.apply(p, bs)
            logp = jax.nn.log_softmax(lg)
            nll = -jnp.take_along_axis(logp, ba[:, None], axis=1)[:, 0]
            ent = -jnp.sum(jax.nn.softmax(lg) * logp, axis=1)
            return jnp.mean(nll * br) - 0.01 * jnp.mean(ent)

        g = jax.grad(loss_fn)(ts.params)
        up, opt_state = opt.update(g, ts.opt_state)
        return ts.replace(params=optax.apply_updates(ts.params, up),
                          opt_state=opt_state, since_train=jnp.int32(0))

    ts = jax.lax.cond(ts.since_train >= cfg.SRL_UPDATE_EVERY,
                      train, lambda t: t, ts)
    return ts, lights, want, phase_req


# ---------------------------------------------------------------------------
# A2C (RL_A2C_BATCHED)
# ---------------------------------------------------------------------------

def a2c_step(cfg: Config, ts: A2CTrain, grid, gs, lights, occupancy, key):
    G = gs.valid.shape[0]
    net = ActorCritic(cfg.A2C_HIDDEN_LAYER_SIZE, cfg.A2C_HIDDEN_LAYERS)
    opt = _optimizer(cfg.SRL_LEARNING_RATE)
    k_act, _ = jax.random.split(key)

    s = features.a2c_state(cfg, grid, gs, lights, occupancy)
    logits, value = net.apply(ts.params, s)
    action = jax.random.categorical(k_act, logits, axis=-1)
    active = gs.valid & (lights.pending_phase == -1)
    lights, want, phase_req = _phase_mechanics(
        cfg, lights, active, action,
        cfg.TRAFFIC_LIGHT_PRESSURE_CONTROL_MIN_GREEN)

    # reward = -(queue + 0.25 * pressure^2)  (`rl_a2c.py:160-164`)
    ln, le = features.group_flows(grid, occupancy, G)
    reward = -(ln + le + 0.25 * (ln - le) ** 2)

    R = ts.roll_s.shape[0]
    t = ts.t
    ts = ts.replace(
        roll_s=ts.roll_s.at[t].set(s),
        roll_a=ts.roll_a.at[t].set(action.astype(jnp.int32)),
        roll_r=ts.roll_r.at[t].set(reward),
        roll_v=ts.roll_v.at[t].set(value),
        roll_m=ts.roll_m.at[t].set(gs.valid),
        t=t + 1)

    def update(ts):
        if cfg.A2C_INTERLEAVED_GAE:
            # exact reference trajectory: GAE over the FLAT interleaved
            # buffer [t0g0, t0g1, ..., t1g0, ...] (`compute_gae`
            # `rl_a2c.py:183-192` runs over BUFFER storage order, which
            # interleaves all groups into one pseudo-trajectory).
            # Invalid (padded) groups are never stored by the reference,
            # so the chain passes through them untouched.
            adv = interleaved_gae(
                cfg.A2C_GAMMA, cfg.A2C_LAMBDA,
                ts.roll_r.reshape(-1), ts.roll_v.reshape(-1),
                ts.roll_m.reshape(-1)).reshape(ts.roll_r.shape)
        else:
            # per-group GAE along time — the declared-deviation default
            # (each group is its own trajectory; PARITY.md)
            def gae_scan(carry, x):
                gae, next_v = carry
                r, v = x
                delta = r + cfg.A2C_GAMMA * next_v - v
                gae = delta + cfg.A2C_GAMMA * cfg.A2C_LAMBDA * gae
                return (gae, v), gae

            (_, _), adv = jax.lax.scan(
                gae_scan, (jnp.zeros((G,)), jnp.zeros((G,))),
                (ts.roll_r, ts.roll_v), reverse=True)
        ret = adv + ts.roll_v
        m = ts.roll_m.reshape(-1)
        advf = adv.reshape(-1)
        mean = jnp.sum(advf * m) / jnp.maximum(jnp.sum(m), 1)
        var = jnp.sum((advf - mean) ** 2 * m) / jnp.maximum(jnp.sum(m), 1)
        advf = (advf - mean) / (jnp.sqrt(var) + 1e-8)
        ent_coef = cfg.A2C_ENTROPY_MIN + \
            (cfg.A2C_ENTROPY_MAX - cfg.A2C_ENTROPY_MIN) * jnp.exp(
                -ts.global_step.astype(jnp.float32)
                / cfg.A2C_ENTROPY_DECAY_STEPS)

        bs = ts.roll_s.reshape(R * G, -1)
        ba = ts.roll_a.reshape(-1)
        bret = ret.reshape(-1)

        def loss_fn(p):
            lg, v = net.apply(p, bs)
            logp = jax.nn.log_softmax(lg)
            alp = jnp.take_along_axis(logp, ba[:, None], axis=1)[:, 0]
            pg = -jnp.sum(alp * advf * m) / jnp.maximum(jnp.sum(m), 1)
            vl = jnp.sum((bret - v) ** 2 * m) / jnp.maximum(jnp.sum(m), 1)
            ent = -jnp.sum(jnp.sum(jnp.exp(logp) * logp, axis=1) * m) / \
                jnp.maximum(jnp.sum(m), 1)
            return pg + 0.5 * vl - ent_coef * ent

        g = jax.grad(loss_fn)(ts.params)
        up, opt_state = opt.update(g, ts.opt_state)
        return ts.replace(params=optax.apply_updates(ts.params, up),
                          opt_state=opt_state, t=jnp.int32(0),
                          global_step=ts.global_step + 1)

    ts = jax.lax.cond(ts.t >= R, update, lambda t: t, ts)
    return ts, lights, want, phase_req


# ---------------------------------------------------------------------------
# GAT-DQN (GAT_DQN / GAT_DQN_BATCHED)
# ---------------------------------------------------------------------------

def gat_step(cfg: Config, ts: GATTrain, grid, gs, lights, occupancy,
             trip_penalty, key):
    """trip_penalty: scalar global reward penalty
    0.01*avg_trip_duration + 1.0*avg_time_per_cell (`rl_gatdqn.py:217-241`)."""
    G = gs.valid.shape[0]
    net = GATQNet()
    opt = _optimizer(1e-3)
    k_eps, k_rand, k_samp = jax.random.split(key, 3)

    feats, mask = features.gat_state(cfg, grid, gs, lights, occupancy)

    # complete LAST tick's pending (s, a) with the now-observable
    # post-action state and reward — the reference stores the transition
    # at the controller's next invocation (`rl_gatdqn.py:217-241`); the
    # same-tick next-state it would otherwise see is degenerate (only
    # timer features change before traffic moves)
    ln, le = features.group_flows(grid, occupancy, G)
    reward = -(ln + le + trip_penalty)
    put = ts.pend_valid & gs.valid
    cap = ts.buf_s.shape[0]
    idx = (ts.cursor + jnp.arange(G)) % cap
    widx = jnp.where(put, idx, cap)
    ts = ts.replace(
        buf_s=ts.buf_s.at[widx].set(ts.pend_s, mode="drop"),
        buf_m=ts.buf_m.at[widx].set(ts.pend_m, mode="drop"),
        buf_a=ts.buf_a.at[widx].set(ts.pend_a, mode="drop"),
        buf_r=ts.buf_r.at[widx].set(reward, mode="drop"),
        buf_ns=ts.buf_ns.at[widx].set(feats, mode="drop"),
        buf_nm=ts.buf_nm.at[widx].set(mask, mode="drop"),
        cursor=(ts.cursor + jnp.sum(put)) % cap,
        filled=jnp.minimum(ts.filled + jnp.sum(put), cap))

    q = net.apply(ts.params, feats, mask)                     # [G, 2]
    greedy = jnp.argmax(q, axis=1)
    explore = jax.random.uniform(k_eps, (G,)) < ts.epsilon
    rand_a = jax.random.randint(k_rand, (G,), 0, 2)
    action = jnp.where(explore, rand_a, greedy)
    epsilon = jnp.maximum(cfg.EPS_MIN, ts.epsilon - cfg.EPS_DECAY_RATE)

    active = gs.valid & (lights.pending_phase == -1)
    lights, want, phase_req = _phase_mechanics(
        cfg, lights, active, action, cfg.GAT_TRAFFIC_RL_MIN_GREEN)

    ts = ts.replace(
        pend_s=feats, pend_m=mask, pend_a=action.astype(jnp.int32),
        pend_valid=gs.valid, epsilon=epsilon)

    def train(ts):
        bidx = jax.random.randint(k_samp, (cfg.GAT_BATCH_SIZE,), 0,
                                  jnp.maximum(ts.filled, 1))
        bs, bm = ts.buf_s[bidx], ts.buf_m[bidx]
        ba, br = ts.buf_a[bidx], ts.buf_r[bidx]
        bns, bnm = ts.buf_ns[bidx], ts.buf_nm[bidx]

        def loss_fn(p):
            qp = net.apply(p, bs, bm)
            qsa = jnp.take_along_axis(qp, ba[:, None], axis=1)[:, 0]
            qn = net.apply(ts.target_params, bns, bnm)
            tgt = br + cfg.GAT_GAMMA * jnp.max(qn, axis=1)
            return jnp.mean((qsa - jax.lax.stop_gradient(tgt)) ** 2)

        g = jax.grad(loss_fn)(ts.params)
        up, opt_state = opt.update(g, ts.opt_state)
        params = optax.apply_updates(ts.params, up)
        steps = ts.train_steps + 1
        sync = (steps % cfg.GAT_TARGET_UPDATE_EVERY) == 0
        target = jax.tree_util.tree_map(
            lambda a, b: jnp.where(sync, a, b), params, ts.target_params)
        return ts.replace(params=params, target_params=target,
                          opt_state=opt_state, train_steps=steps)

    ts = jax.lax.cond(ts.filled >= cfg.GAT_BATCH_SIZE, train,
                      lambda t: t, ts)
    return ts, lights, want, phase_req


def rl_controller_step(cfg: Config, rl_state, grid, gs, lights, occupancy,
                       stuck_map, trip_penalty, key):
    algo = cfg.TRAFFIC_LIGHT_AGENT_ALGORITHM
    if algo in ("NEIGHBOR_RL", "NEIGHBOR_RL_BATCHED"):
        return srl_step(cfg, rl_state, grid, gs, lights, occupancy,
                        stuck_map, key)
    if algo == "RL_A2C_BATCHED":
        return a2c_step(cfg, rl_state, grid, gs, lights, occupancy, key)
    if algo in ("GAT_DQN", "GAT_DQN_BATCHED"):
        return gat_step(cfg, rl_state, grid, gs, lights, occupancy,
                        trip_penalty, key)
    raise ValueError(algo)
