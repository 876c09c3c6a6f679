"""Pure-NumPy oracle of the reference TF1 forward pass.

An INDEPENDENT re-implementation of the reference's math (model.py:104-205,
Utils/attention.py, TF1 BasicLSTMCell / contrib layer_norm semantics) used as
the parity fixture: the JAX model must reproduce these activations allclose
when fed the same parameter pytree (SURVEY.md §4's "captured TF1 run" stand-in,
since TF1 is not installed in this image).

Everything here is written against the REFERENCE's documented behavior, not
against sagnn_tpu's code, so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np


def leaky_relu(x, slope):
    return np.maximum(slope * x, x)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def propagate_dense(adj_dense: np.ndarray, src_emb: np.ndarray,
                    slope: float) -> np.ndarray:
    """messagePropagate (model.py:80-92): unweighted sum over in-edges of the
    BINARY adjacency (edge multiplicity collapses to one message in COO),
    then leakyRelu."""
    binary = (adj_dense != 0).astype(np.float64)
    return leaky_relu(binary @ src_emb, slope)


def interval_propagation(u_embed, i_embed, sub_dense, gnn_layer, slope):
    """model.py:118-129 for all graphs. sub_dense: [g, U, I] dense interval
    adjacencies. Returns user_vec [g, U, D], item_vec [g, I, D]."""
    g = len(sub_dense)
    user_out, item_out = [], []
    for k in range(g):
        embs0 = [u_embed[k].astype(np.float64)]
        embs1 = [i_embed[k].astype(np.float64)]
        for _ in range(gnn_layer):
            a0 = propagate_dense(sub_dense[k], embs1[-1], slope)
            a1 = propagate_dense(sub_dense[k].T, embs0[-1], slope)
            embs0.append(a0 + embs0[-1])
            embs1.append(a1 + embs1[-1])
        user_out.append(np.sum(embs0, axis=0))
        item_out.append(np.sum(embs1, axis=0))
    return np.stack(user_out), np.stack(item_out)


def lstm(kernel, bias, x, forget_bias=1.0):
    """TF1 BasicLSTMCell via dynamic_rnn. x: [N, T, D] -> [N, T, H]."""
    N, T, D = x.shape
    H = kernel.shape[1] // 4
    c = np.zeros((N, H))
    h = np.zeros((N, H))
    outs = []
    for t in range(T):
        gates = np.concatenate([x[:, t], h], axis=-1) @ kernel + bias
        i, j, f, o = np.split(gates, 4, axis=-1)
        c = c * sigmoid(f + forget_bias) + sigmoid(i) * np.tanh(j)
        h = sigmoid(o) * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1)


def layer_norm(x, scale, shift, eps=1e-12):
    """tf.contrib.layers.layer_norm defaults: stats over axes 1.. jointly,
    params over last axis."""
    axes = tuple(range(1, x.ndim))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + shift


def mhsa(p, x, num_heads):
    """Utils/attention.py:31-78: dense QKV with bias, exp scores normalized
    by sum + 1e-8, heads re-merged, no output projection."""
    B, T, D = x.shape
    dk = D // num_heads

    def heads(y):
        return y.reshape(B, T, num_heads, dk).transpose(0, 2, 1, 3)

    q = heads(x @ p["wq"] + p["bq"])
    k = heads(x @ p["wk"] + p["bk"])
    v = heads(x @ p["wv"] + p["bv"])
    scores = np.exp(np.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(dk))
    attn = scores / (scores.sum(axis=-1, keepdims=True) + 1e-8)
    ctx = np.einsum("bhts,bhsd->bhtd", attn, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, T, D)


def forward(params, sub_dense, cfg, seq, seq_mask):
    """Deterministic (keepRate=1) full forward. Returns a dict of named
    activations for layer-by-layer comparison.

    params: the sagnn_tpu param pytree converted to numpy.
    sub_dense: [g, U, I] dense interval adjacencies.
    cfg: ModelConfig.
    """
    reg, free = params["reg"], params["free"]
    acts = {}
    user_vec, item_vec = interval_propagation(
        reg["u_embed"], reg["i_embed"], sub_dense, cfg.gnn_layer, cfg.leaky)
    acts["user_vec"] = user_vec
    acts["item_vec"] = item_vec

    user_t = user_vec.transpose(1, 0, 2)
    item_t = item_vec.transpose(1, 0, 2)
    user_t = lstm(free["lstm"]["kernel"], free["lstm"]["bias"], user_t)
    item_t = lstm(free["lstm"]["kernel"], free["lstm"]["bias"], item_t)
    acts["user_rnn"] = user_t
    acts["item_rnn"] = item_t

    mu = mhsa(free["mhsa_user"],
              layer_norm(user_t, free["ln_user"]["scale"],
                         free["ln_user"]["shift"]), cfg.num_heads)
    mi = mhsa(free["mhsa_item"],
              layer_norm(item_t, free["ln_item"]["scale"],
                         free["ln_item"]["shift"]), cfg.num_heads)
    final_user = mu.mean(axis=1)
    final_item = mi.mean(axis=1)
    acts["final_user"] = final_user
    acts["final_item"] = final_item

    # sequence branch (model.py:158-167): pooled to one token (Q3)
    seq_emb = final_item[seq]                        # [B, L, D]
    pooled_items = np.einsum("bl,bld->bd", seq_mask, seq_emb)[:, None, :]
    pooled_pos = np.einsum("bl,ld->bd", seq_mask,
                           reg["pos_embed"])[:, None, :]
    x = layer_norm(pooled_items, free["seq_ln_item"]["scale"],
                   free["seq_ln_item"]["shift"])
    x = x + layer_norm(pooled_pos, free["seq_ln_pos"]["scale"],
                       free["seq_ln_pos"]["shift"])
    for i in range(cfg.att_layer):
        ln = free["seq_ln"][i]
        h = mhsa(free["seq_mhsa"][i],
                 layer_norm(x, ln["scale"], ln["shift"]), cfg.num_heads)
        x = leaky_relu(h, cfg.leaky) + x
    att_user = x.sum(axis=1)
    acts["att_user"] = att_user

    # meta-network user weights (model.py:176-184)
    weights = []
    for k in range(len(sub_dense)):
        meta1 = np.concatenate(
            [final_user * user_vec[k], final_user, user_vec[k]], axis=-1)
        meta2 = leaky_relu(meta1 @ reg["meta2_w"] + free["meta2_b"],
                           cfg.leaky)
        weights.append(sigmoid(meta2 @ reg["meta3_w"] + free["meta3_b"])[:, 0])
    acts["user_weight"] = np.stack(weights)
    return acts


def predictions(acts, uids, iids, useq_row, slope):
    """model.py:169-173."""
    fu, fi, au = acts["final_user"], acts["final_item"], acts["att_user"]
    base = np.sum(fu[uids] * fi[iids], axis=-1)
    seq_part = np.sum(leaky_relu(au[useq_row], slope) * fi[iids], axis=-1)
    return base + seq_part


def ssl_loss(acts, ssl_pairs, slope):
    """model.py:185-204. ssl_pairs: list over graphs of (ua, ia, ub, ib)."""
    fu, fi = acts["final_user"], acts["final_item"]
    uv, iv, w = acts["user_vec"], acts["item_vec"], acts["user_weight"]
    total = 0.0
    for k, (ua, ia, ub, ib) in enumerate(ssl_pairs):
        sa = np.sum(leaky_relu(fu[ua] * fi[ia], slope), axis=-1)
        sb = np.sum(leaky_relu(fu[ub] * fi[ib], slope), axis=-1)
        s_final = w[k][ua] * sa - w[k][ub] * sb
        pa = np.sum(leaky_relu(uv[k][ua] * iv[k][ia], slope), axis=-1)
        pb = np.sum(leaky_relu(uv[k][ub] * iv[k][ib], slope), axis=-1)
        total += np.sum(np.maximum(0.0, 1.0 - s_final * (pa - pb)))
    return total


def hr_ndcg_reference(preds_row, cand_row, pos_item, k):
    """The reference's exact sort-based metric (model.py:495-509)."""
    predvals = list(zip(preds_row, cand_row))
    predvals.sort(key=lambda x: x[0], reverse=True)
    shoot = [x[1] for x in predvals[:k]]
    if pos_item in shoot:
        return 1, float(np.reciprocal(np.log2(shoot.index(pos_item) + 2)))
    return 0, 0.0
