"""CPU-reference stand-in benchmark: the north star is ">=50x the TF-CPU
reference" (BASELINE.json:5); the reference itself is unrunnable here
(reference mount empty — SURVEY §0), so this script measures faithful
re-implementations of the reference's training-step SEMANTICS at the
flagship shape, in two backends:

  * ``--impl tf1`` — the REAL TF1 execution model via ``tf.compat.v1``:
    static graph, ``Session.run`` with ``feed_dict`` data feeding,
    ``tf.while_loop`` + ``TensorArray`` time recurrence (hand-rolled LSTM
    gate ops — identical op granularity to TF1's ``LSTMCell.call``, whose
    keras home is broken on this image), ``tf.random_uniform``-based
    Bernoulli sampling, ``AdamOptimizer``. This is the closest runnable
    thing to the reference's TF 1.x runtime that exists in this
    environment.
  * ``--impl torch`` — a torch-CPU re-implementation at the same op
    granularity (LSTMCell python loop over T, CD-1 block Gibbs, NADE
    per-dim loop). Torch batched CPU ops are at least as fast as a TF1
    feed_dict session on the same core, so its ratios UNDERSTATE the true
    speedup; it cross-checks the tf1 numbers.

Both implement, per the reconstructed reference (SURVEY C5-C8):
  * RNN-RBM: per-step conditioned biases, CD-1 block Gibbs with sampling
    under stop_gradient, free-energy-difference loss. 5 tracks with the
    feedback context (teacher-forced).
  * RNN-NADE: exact likelihood via the PER-DIMENSION loop the reference's
    TF1 graph builds (no parallel cumsum form exists in the reference —
    SURVEY C6/[K]): D sequential conditional ops per step.

Run: python scripts/cpu_reference_bench.py [--impl both] [--iters 3]
"""

import argparse
import time

import numpy as np
import torch


def _lstm_feedback_states(cells, x_tracks, ctx):
    """Per-track LSTMCell loops over T with the feedback context appended to
    the input (TF1 while_loop semantics). x_tracks: (K, B, T, D);
    ctx: (B, T, K*D). Returns u_prev per track: (K, B, T, U)."""
    k, b, t, d = x_tracks.shape
    outs = []
    for ki in range(k):
        cell = cells[ki]
        u = torch.zeros(b, cell.hidden_size)
        c = torch.zeros(b, cell.hidden_size)
        us = []
        for ti in range(t):
            us.append(u)                    # u(t-1) conditions step t
            inp = torch.cat([x_tracks[ki, :, ti], ctx[:, ti]], dim=1)
            u, c = cell(inp, (u, c))
        outs.append(torch.stack(us, dim=1))
    return torch.stack(outs)                # (K, B, T, U)


def _free_energy(v, w, bv, bh):
    # F(v) = -v.bv - sum softplus(v@W + bh); biases per (B,T)
    return (-(v * bv).sum(-1)
            - torch.nn.functional.softplus(v @ w + bh).sum(-1))


def bench_rbm(k_tracks=5, d=84, h=150, u=100, b=16, t=64, iters=3,
              seed=0):
    torch.manual_seed(seed)
    cells = [torch.nn.LSTMCell(d + k_tracks * d, u) for _ in range(k_tracks)]
    params = []
    for c in cells:
        params += list(c.parameters())
    w = [torch.randn(d, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    bv0 = [torch.zeros(d, requires_grad=True) for _ in range(k_tracks)]
    bh0 = [torch.zeros(h, requires_grad=True) for _ in range(k_tracks)]
    wuv = [torch.randn(u, d).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    wuh = [torch.randn(u, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    params += w + bv0 + bh0 + wuv + wuh
    opt = torch.optim.Adam(params, lr=1e-3)
    x = (torch.rand(k_tracks, b, t, d) < 0.06).float()
    ctx = torch.cat([torch.zeros(b, 1, k_tracks * d),
                     x.permute(1, 2, 0, 3).reshape(b, t, -1)[:, :-1]], dim=1)

    def step():
        opt.zero_grad()
        u_prev = _lstm_feedback_states(cells, x, ctx)      # (K,B,T,U)
        loss = 0.0
        for ki in range(k_tracks):
            bv = bv0[ki] + u_prev[ki] @ wuv[ki]            # (B,T,D)
            bh = bh0[ki] + u_prev[ki] @ wuh[ki]            # (B,T,H)
            v0 = x[ki]
            # CD-1 block Gibbs, sampling detached (stop_gradient)
            with torch.no_grad():
                ph = torch.sigmoid(v0 @ w[ki] + bh)
                hs = torch.bernoulli(ph)
                pv = torch.sigmoid(hs @ w[ki].T + bv)
                vk = torch.bernoulli(pv)
            loss = loss + (_free_energy(v0, w[ki], bv, bh)
                           - _free_energy(vk, w[ki], bv, bh)).mean()
        (loss / k_tracks).backward()
        opt.step()
        return float(loss.detach())

    step(); step()                                         # warm-up
    times, loss = [], None
    for _ in range(iters):
        t0 = time.time(); loss = step(); times.append(time.time() - t0)
    return min(times), b * t, loss


def bench_nade(k_tracks=5, d=84, h=150, u=100, b=16, t=64, iters=3,
               seed=0):
    torch.manual_seed(seed)
    cells = [torch.nn.LSTMCell(d + k_tracks * d, u) for _ in range(k_tracks)]
    params = []
    for c in cells:
        params += list(c.parameters())
    w = [torch.randn(d, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    vv = [torch.randn(d, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    bv0 = [torch.zeros(d, requires_grad=True) for _ in range(k_tracks)]
    bh0 = [torch.zeros(h, requires_grad=True) for _ in range(k_tracks)]
    wuv = [torch.randn(u, d).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    wuh = [torch.randn(u, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    params += w + vv + bv0 + bh0 + wuv + wuh
    opt = torch.optim.Adam(params, lr=1e-3)
    x = (torch.rand(k_tracks, b, t, d) < 0.06).float()
    ctx = torch.cat([torch.zeros(b, 1, k_tracks * d),
                     x.permute(1, 2, 0, 3).reshape(b, t, -1)[:, :-1]], dim=1)

    def step():
        opt.zero_grad()
        u_prev = _lstm_feedback_states(cells, x, ctx)
        loss = 0.0
        for ki in range(k_tracks):
            bv = bv0[ki] + u_prev[ki] @ wuv[ki]            # (B,T,D)
            bh = bh0[ki] + u_prev[ki] @ wuh[ki]            # (B,T,H)
            xk = x[ki].reshape(-1, d)                      # (B*T, D)
            bvf, bhf = bv.reshape(-1, d), bh.reshape(-1, h)
            # the reference's per-dimension NADE loop (TF1 graph: D
            # sequential conditional ops — no parallel-cumsum form exists
            # in the reference)
            a = bhf
            ll = 0.0
            for i in range(d):
                hi = torch.sigmoid(a)                      # (N, H)
                logit = bvf[:, i] + hi @ vv[ki][i]
                xi = xk[:, i]
                ll = ll + (xi * torch.nn.functional.logsigmoid(logit)
                           + (1 - xi)
                           * torch.nn.functional.logsigmoid(-logit))
                a = a + xi[:, None] * w[ki][i][None, :]
            loss = loss - ll.mean()
        (loss / k_tracks).backward()
        opt.step()
        return float(loss.detach())

    step(); step()
    times, loss = [], None
    for _ in range(iters):
        t0 = time.time(); loss = step(); times.append(time.time() - t0)
    return min(times), b * t, loss


def _tf1_graph_common(v1, tf, rng, k_tracks, d, h, u, extra=()):
    """Variables shared by both TF1 benches. Returns dict of per-track
    variable lists (python lists of tf Variables, one per track)."""
    def var(name, shape, scale=0.01):
        init = (rng.standard_normal(shape) * scale).astype("float32") \
            if scale else np.zeros(shape, "float32")
        return v1.get_variable(name, initializer=init)

    vs = {
        "wx": [var(f"wx{i}", (d + k_tracks * d, 4 * u)) for i in range(k_tracks)],
        "wh": [var(f"wh{i}", (u, 4 * u)) for i in range(k_tracks)],
        "bl": [var(f"bl{i}", (4 * u,), 0) for i in range(k_tracks)],
        "w": [var(f"w{i}", (d, h)) for i in range(k_tracks)],
        "bv0": [var(f"bv{i}", (d,), 0) for i in range(k_tracks)],
        "bh0": [var(f"bh{i}", (h,), 0) for i in range(k_tracks)],
        "wuv": [var(f"wuv{i}", (u, d)) for i in range(k_tracks)],
        "wuh": [var(f"wuh{i}", (u, h)) for i in range(k_tracks)],
    }
    for name in extra:
        vs[name] = [var(f"{name}{i}", (d, h)) for i in range(k_tracks)]
    return vs


def _tf1_lstm_feedback_states(v1, tf, x, ctx, vs, k_tracks, b, t, u):
    """The TF1 time recurrence: tf.while_loop + TensorArray per track,
    hand-rolled LSTM gates (matmul + split + sigmoid/tanh — the exact op
    granularity of TF1's LSTMCell.call). Returns list of (B,T,U) u_prev
    tensors (u(t-1) conditions step t, matching the torch bench)."""
    outs = []
    for ki in range(k_tracks):
        inp = tf.concat([x[ki], ctx], axis=2)            # (B,T,D+K*D)
        ta0 = tf.TensorArray(tf.float32, size=t)
        wx, wh, bl = vs["wx"][ki], vs["wh"][ki], vs["bl"][ki]

        def body(ti, uu, cc, ta, inp=inp, wx=wx, wh=wh, bl=bl):
            ta = ta.write(ti, uu)                        # u(t-1) at index t
            gates = tf.matmul(inp[:, ti], wx) + tf.matmul(uu, wh) + bl
            gi, gf, gg, go = tf.split(gates, 4, axis=1)
            cc = tf.sigmoid(gf) * cc + tf.sigmoid(gi) * tf.tanh(gg)
            uu = tf.sigmoid(go) * tf.tanh(cc)
            return ti + 1, uu, cc, ta

        _, _, _, ta = v1.while_loop(
            lambda ti, uu, cc, ta: ti < t, body,
            [tf.constant(0), tf.zeros([b, u]), tf.zeros([b, u]), ta0])
        outs.append(tf.transpose(ta.stack(), [1, 0, 2]))  # (B,T,U)
    return outs


def _tf1_session_bench(graph_fn, iters, seed, k_tracks, d, b, t):
    """Build the TF1 graph, run Session.run(train_op, feed_dict) steps,
    return (best seconds, frames, last loss)."""
    import tensorflow as tf
    v1 = tf.compat.v1
    v1.reset_default_graph()
    rng = np.random.default_rng(seed)
    g = v1.Graph()
    with g.as_default():
        x = v1.placeholder(tf.float32, [k_tracks, b, t, d], name="x")
        ctx = v1.placeholder(tf.float32, [b, t, k_tracks * d], name="ctx")
        loss = graph_fn(v1, tf, rng, x, ctx)
        train_op = v1.train.AdamOptimizer(1e-3).minimize(loss)
        init = v1.global_variables_initializer()
    x_np = (rng.random((k_tracks, b, t, d)) < 0.06).astype("float32")
    ctx_np = np.concatenate(
        [np.zeros((b, 1, k_tracks * d), "float32"),
         x_np.transpose(1, 2, 0, 3).reshape(b, t, -1)[:, :-1]], axis=1)
    feed = {x: x_np, ctx: ctx_np}
    with v1.Session(graph=g) as sess:
        sess.run(init)
        sess.run([train_op, loss], feed_dict=feed)       # warm-up x2
        sess.run([train_op, loss], feed_dict=feed)
        times, lv = [], None
        for _ in range(iters):
            t0 = time.time()
            _, lv = sess.run([train_op, loss], feed_dict=feed)
            times.append(time.time() - t0)
    return min(times), b * t, float(lv)


def bench_rbm_tf1(k_tracks=5, d=84, h=150, u=100, b=16, t=64, iters=3,
                  seed=0):
    def graph(v1, tf, rng, x, ctx):
        vs = _tf1_graph_common(v1, tf, rng, k_tracks, d, h, u)
        u_prev = _tf1_lstm_feedback_states(v1, tf, x, ctx, vs, k_tracks, b, t, u)

        def free_energy(v, w, bv, bh):
            return (-tf.reduce_sum(v * bv, -1)
                    - tf.reduce_sum(tf.math.softplus(tf.matmul(v, w) + bh), -1))

        loss = 0.0
        for ki in range(k_tracks):
            w = vs["w"][ki]
            bv = vs["bv0"][ki] + tf.matmul(u_prev[ki], vs["wuv"][ki])
            bh = vs["bh0"][ki] + tf.matmul(u_prev[ki], vs["wuh"][ki])
            v0 = x[ki]
            # CD-1 block Gibbs at TF1 op granularity; samples stop_gradient'd
            ph = tf.sigmoid(tf.matmul(v0, w) + bh)
            hs = tf.stop_gradient(tf.cast(
                v1.random_uniform(tf.shape(ph)) < ph, tf.float32))
            pv = tf.sigmoid(tf.matmul(hs, w, transpose_b=True) + bv)
            vk = tf.stop_gradient(tf.cast(
                v1.random_uniform(tf.shape(pv)) < pv, tf.float32))
            loss = loss + tf.reduce_mean(
                free_energy(v0, w, bv, bh) - free_energy(vk, w, bv, bh))
        return loss / k_tracks

    return _tf1_session_bench(graph, iters, seed, k_tracks, d, b, t)


def bench_nade_tf1(k_tracks=5, d=84, h=150, u=100, b=16, t=64, iters=3,
                   seed=0):
    def graph(v1, tf, rng, x, ctx):
        vs = _tf1_graph_common(v1, tf, rng, k_tracks, d, h, u, extra=("vv",))
        u_prev = _tf1_lstm_feedback_states(v1, tf, x, ctx, vs, k_tracks, b, t, u)
        loss = 0.0
        for ki in range(k_tracks):
            w, vv = vs["w"][ki], vs["vv"][ki]
            bv = vs["bv0"][ki] + tf.matmul(u_prev[ki], vs["wuv"][ki])
            bh = vs["bh0"][ki] + tf.matmul(u_prev[ki], vs["wuh"][ki])
            xk = tf.reshape(x[ki], [-1, d])              # (N, D), N = B*T
            bvf, bhf = tf.reshape(bv, [-1, d]), tf.reshape(bh, [-1, h])
            # the reference's per-dimension NADE loop: D sequential graph
            # ops (log sigmoid(z) = -softplus(-z))
            a = bhf
            ll = 0.0
            for i in range(d):
                hi = tf.sigmoid(a)                       # (N, H)
                logit = bvf[:, i] + tf.linalg.matvec(hi, vv[i])
                xi = xk[:, i]
                ll = ll + (xi * (-tf.math.softplus(-logit))
                           + (1.0 - xi) * (-tf.math.softplus(logit)))
                a = a + xi[:, None] * w[i][None, :]
            loss = loss - tf.reduce_mean(ll)
        return loss / k_tracks

    return _tf1_session_bench(graph, iters, seed, k_tracks, d, b, t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impl", choices=("torch", "tf1", "both"),
                    default="both")
    # the measured single-chip v5e ms/step at the same B=16 flagship shape
    # (BASELINE.md train rows — update these if those rows are re-measured)
    ap.add_argument("--tpu-rbm-ms", type=float, default=0.88)
    ap.add_argument("--tpu-nade-ms", type=float, default=1.66)
    args = ap.parse_args()
    results = {}
    if args.impl in ("torch", "both"):
        print(f"torch {torch.__version__} threads={torch.get_num_threads()}")
        s, frames, loss = bench_rbm(iters=args.iters)
        print(f"[torch] RNN-RBM  CD-1 flagship (5-track feedback B=16 T=64): "
              f"{s*1e3:8.1f} ms/step  ({frames/s:7.0f} frames/s, "
              f"loss {loss:.3f})")
        s_n, frames, loss_n = bench_nade(iters=args.iters)
        print(f"[torch] RNN-NADE exact-LL flagship (per-dim reference loop):  "
              f"{s_n*1e3:8.1f} ms/step  ({frames/s_n:7.0f} frames/s, "
              f"loss {loss_n:.3f})")
        results["torch"] = (s, s_n)
    if args.impl in ("tf1", "both"):
        import tensorflow as tf
        print(f"tensorflow {tf.__version__} (compat.v1 graph mode, "
              f"Session.run + feed_dict)")
        s, frames, loss = bench_rbm_tf1(iters=args.iters)
        print(f"[tf1]   RNN-RBM  CD-1 flagship (while_loop recurrence):      "
              f"{s*1e3:8.1f} ms/step  ({frames/s:7.0f} frames/s, "
              f"loss {loss:.3f})")
        s_n, frames, loss_n = bench_nade_tf1(iters=args.iters)
        print(f"[tf1]   RNN-NADE exact-LL flagship (per-dim graph loop):     "
              f"{s_n*1e3:8.1f} ms/step  ({frames/s_n:7.0f} frames/s, "
              f"loss {loss_n:.3f})")
        results["tf1"] = (s, s_n)
    print(f"vs BASELINE.md v5e rows at equal B=16: RBM {args.tpu_rbm_ms} "
          f"ms/step, NADE (grid-free kernel) {args.tpu_nade_ms} ms/step")
    for impl, (s, s_n) in results.items():
        print(f"ratios[{impl}]: RBM {s*1e3/args.tpu_rbm_ms:.0f}x, "
              f"NADE {s_n*1e3/args.tpu_nade_ms:.0f}x")


if __name__ == "__main__":
    main()
