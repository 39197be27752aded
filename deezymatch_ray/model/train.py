"""NumPy trainer for the siamese char-GRU — mirrors the reference's
``fit`` loop (rnn_networks.py:302-520): Adam, unweighted 2-class CE
(:164-169), per-epoch shuffle, optional validation + early stopping
(:450-507), and the ``finetune`` freeze rule — a parameter is frozen iff
its name contains any ``layers_to_freeze`` entry (:216-221).

Training runs on the driver over arrays collected from the Ray pipeline
(the model is tiny — vocab×E embedding + 2×H bi-GRU); the *data* prep is
distributed, the optimizer is not (SURVEY §2.3 T7).

Backprop is analytic (BPTT through the masked GRU/LSTM/RNN recurrence)
and gradient-checked against numerical differentiation in
tests/test_model.py. All reference architectures (gru, lstm, rnn —
rnn_networks.py:72-90) and all trainable pooling modes
(rnn_networks.py:920-1099) are supported: ``hstates_layers_simple``,
``hstates``, ``hstates_layers``, ``attention``, ``average``,
``max``/``maximum``, ``hstates_subtract``, ``hstates_l2_distance``
(``hstates_cosine`` has no trainable head in the reference either —
its output is the cosine itself, rnn_networks.py:1093-1099).
"""

from __future__ import annotations

import numpy as np

from .chargru import CharGRU, sigmoid


class _LegTape:
    """Forward activations of one encoder leg needed for BPTT."""

    def __init__(self):
        self.layer_inputs: list[np.ndarray] = []  # input to each layer [B,T,in]
        self.caches: list[list] = []  # per (layer, dir): step cache
        self.outs: list[list[np.ndarray]] = []  # per layer: per dir outputs
        self.drop_masks: list[np.ndarray | None] = []


class SiameseTrainer(CharGRU):
    """CharGRU + gradients. Weight dict is shared with the inference class."""

    TRAINABLE_POOLING = (
        "hstates_layers_simple", "hstates", "hstates_layers", "attention",
        "average", "max", "maximum", "hstates_subtract", "hstates_l2_distance",
    )

    def __init__(self, weights, num_layers=2, bidirectional=True, arch="gru",
                 pooling_mode="hstates_layers_simple", rnn_dropout=0.0,
                 fc_dropout=(0.0, 0.0), seed=123):
        assert arch in ("gru", "lstm", "rnn"), arch
        assert pooling_mode in self.TRAINABLE_POOLING, pooling_mode
        super().__init__(weights, num_layers, bidirectional, arch, pooling_mode)
        self.rnn_dropout = rnn_dropout
        self.fc_dropout = fc_dropout
        self.rng = np.random.default_rng(seed)

    # ---------------- forward with tape ----------------
    def _encode_tape(self, x, lens, train: bool) -> tuple[np.ndarray, _LegTape]:
        lens = np.asarray(lens, dtype=np.int64)
        tape = _LegTape()
        inp = self.w["emb"][x]
        B, T = x.shape
        h_n = np.zeros((self.num_layers, self.ndir, B, self.H), dtype=inp.dtype)
        for l in range(self.num_layers):
            tape.layer_inputs.append(inp)
            outs = []
            for d in range(self.ndir):
                cache: list = []
                o, h = self._run_direction(inp, lens, l, d, cache=cache)
                tape.caches.append(cache)
                outs.append(o)
                h_n[l, d] = h
            tape.outs.append(outs)
            inp = np.concatenate(outs, axis=2) if self.ndir == 2 else outs[0]
            if train and self.rnn_dropout > 0 and l < self.num_layers - 1:
                mask = (self.rng.random(inp.shape) >= self.rnn_dropout) / (1 - self.rnn_dropout)
                inp = inp * mask.astype(inp.dtype)
                tape.drop_masks.append(mask.astype(inp.dtype))
            else:
                tape.drop_masks.append(None)
        tape.h_n = h_n
        tape.final_input = inp
        return h_n, tape

    _SEQ_POOLING = ("attention", "average", "max", "maximum")
    _FOUR_WAY = ("attention", "average", "max", "maximum", "hstates", "hstates_layers")

    def _pool_final(self, h_n) -> np.ndarray:
        if self.pooling_mode == "hstates":
            parts = [h_n[-1, d] for d in range(self.ndir)]
        else:
            parts = [h_n[l, 0] for l in range(self.num_layers)]
            if self.ndir == 2:
                parts += [h_n[l, 1] for l in range(self.num_layers)]
        return np.concatenate(parts, axis=1)

    # ---------------- sequence pooling (last-layer outputs) ----------------
    def _pool_seq_forward(self, rnn_out, lens):
        """attention/average/max over the masked timestep axis; returns
        (pooled [B,D], ctx for backward)."""
        mode = self.pooling_mode
        T = rnn_out.shape[1]
        mask = np.arange(T)[None, :] < lens[:, None]  # [B,T]
        if mode == "average":
            p = rnn_out.sum(axis=1) / np.maximum(lens[:, None], 1)
            return p.astype(rnn_out.dtype), {"mask": mask}
        if mode in ("max", "maximum"):
            neg = np.where(mask[:, :, None], rnn_out, -np.inf)
            idx = neg.argmax(axis=1)  # [B,D]
            p = np.take_along_axis(rnn_out, idx[:, None, :], axis=1)[:, 0, :]
            return p, {"idx": idx}
        # attention: per-timestep MLP scores, masked softmax
        a1_pre = rnn_out @ self.w["attn.W1"].T + self.w["attn.b1"]
        a1 = np.maximum(a1_pre, 0.0)
        scores = (a1 @ self.w["attn.W2"].T + self.w["attn.b2"])[:, :, 0]
        scores = np.where(mask, scores, -np.inf)
        scores = scores - scores.max(axis=1, keepdims=True)
        e = np.exp(scores)
        wts = e / e.sum(axis=1, keepdims=True)
        p = (rnn_out * wts[:, :, None]).sum(axis=1)
        return p, {"a1_pre": a1_pre, "a1": a1, "wts": wts}

    def _pool_seq_backward(self, rnn_out, lens, dp, ctx, grads):
        """Grad of sequence pooling wrt the last layer's outputs [B,T,D]
        (+ attention-MLP weight grads)."""
        mode = self.pooling_mode
        if mode == "average":
            denom = np.maximum(lens[:, None], 1).astype(rnn_out.dtype)
            return ctx["mask"][:, :, None] * (dp / denom)[:, None, :]
        if mode in ("max", "maximum"):
            d_out = np.zeros_like(rnn_out)
            np.put_along_axis(d_out, ctx["idx"][:, None, :], dp[:, None, :], axis=1)
            return d_out
        wts, a1, a1_pre = ctx["wts"], ctx["a1"], ctx["a1_pre"]
        d_out = wts[:, :, None] * dp[:, None, :]
        dw = (rnn_out * dp[:, None, :]).sum(axis=2)  # [B,T]
        ds = wts * (dw - (wts * dw).sum(axis=1, keepdims=True))  # masked → wts=0 → ds=0
        grads["attn.W2"] += np.einsum("bt,bte->e", ds, a1)[None, :]
        grads["attn.b2"] += ds.sum()
        d_a1pre = (ds[:, :, None] * self.w["attn.W2"][0][None, None, :]) * (a1_pre > 0)
        grads["attn.W1"] += np.einsum("bte,btd->ed", d_a1pre, rnn_out)
        grads["attn.b1"] += d_a1pre.sum(axis=(0, 1))
        d_out += d_a1pre @ self.w["attn.W1"]
        return d_out

    def _unpool_grad(self, dp: np.ndarray) -> np.ndarray:
        """Split pooled-state grad back into dh_n [n_layers, ndir, B, H]."""
        B = dp.shape[0]
        dh_n = np.zeros((self.num_layers, self.ndir, B, self.H), dtype=dp.dtype)
        chunks = np.split(dp, dp.shape[1] // self.H, axis=1)
        if self.pooling_mode == "hstates":
            for d in range(self.ndir):
                dh_n[-1, d] = chunks[d]
        else:
            i = 0
            for d in range(self.ndir):
                for l in range(self.num_layers):
                    dh_n[l, d] = chunks[i]
                    i += 1
        return dh_n

    # ---------------- backward ----------------
    def _backward_direction(self, l, d, cache, inp, d_out, d_hT, grads):
        """BPTT through one direction of one layer (gru / lstm / rnn).

        cache holds steps in forward order; iterate reversed. Returns
        d_inp [B,T,in]."""
        H = self.H
        W_ih = self.w[f"rnn_1.W_ih_l{l}_d{d}"]
        W_hh = self.w[f"rnn_1.W_hh_l{l}_d{d}"]
        B, T, _ = inp.shape
        n_gates = W_ih.shape[0] // H
        d_gi_all = np.zeros((B, T, n_gates * H), dtype=inp.dtype)
        dW_hh = grads[f"rnn_1.W_hh_l{l}_d{d}"]
        db_hh = grads[f"rnn_1.b_hh_l{l}_d{d}"]
        dh = d_hT.copy()
        dc = np.zeros_like(dh) if self.arch == "lstm" else None
        for (t, h_prev, c2, c3, c4, c5, valid) in reversed(cache):
            vf = valid.astype(inp.dtype)
            g_new = (dh + d_out[:, t]) * vf
            dh_prev = dh * (1.0 - vf)
            if self.arch == "gru":
                r, z, n, gh_n = c2, c3, c4, c5
                dz = g_new * (h_prev - n)
                dn = g_new * (1.0 - z)
                dh_prev += g_new * z
                da_n = dn * (1.0 - n * n)
                dr = da_n * gh_n
                d_gh_n = da_n * r
                da_z = dz * z * (1.0 - z)
                da_r = dr * r * (1.0 - r)
                d_gh = np.concatenate([da_r, da_z, d_gh_n], axis=1)  # [B,3H]
                dh_prev += d_gh @ W_hh
                dW_hh += d_gh.T @ h_prev
                db_hh += d_gh.sum(axis=0)
                d_gi_all[:, t] = np.concatenate([da_r, da_z, da_n], axis=1)
            elif self.arch == "lstm":
                c_prev, (i, f, g, o), c_new = c2, c3, c4
                tc = np.tanh(c_new)
                do = g_new * tc
                dc_total = dc * vf + g_new * o * (1.0 - tc * tc)
                dc_prev = dc * (1.0 - vf) + dc_total * f
                di = dc_total * g
                df = dc_total * c_prev
                dg = dc_total * i
                da = np.concatenate([
                    di * i * (1.0 - i), df * f * (1.0 - f),
                    dg * (1.0 - g * g), do * o * (1.0 - o),
                ], axis=1)  # [B,4H]; a = gi + gh so d_gh = d_gi = da
                dh_prev += da @ W_hh
                dW_hh += da.T @ h_prev
                db_hh += da.sum(axis=0)
                d_gi_all[:, t] = da
                dc = dc_prev
            else:  # rnn: h_new = tanh(gi + gh)
                h_new = c4
                da = g_new * (1.0 - h_new * h_new)
                dh_prev += da @ W_hh
                dW_hh += da.T @ h_prev
                db_hh += da.sum(axis=0)
                d_gi_all[:, t] = da
            dh = dh_prev
        grads[f"rnn_1.W_ih_l{l}_d{d}"] += np.einsum("btg,bti->gi", d_gi_all, inp)
        grads[f"rnn_1.b_ih_l{l}_d{d}"] += d_gi_all.sum(axis=(0, 1))
        return d_gi_all @ W_ih

    def _backward_leg(self, x, tape: _LegTape, dp, grads, d_top_out=None) -> None:
        """``dp``: grad wrt pooled h_n states (None for sequence pooling);
        ``d_top_out``: grad wrt the top layer's outputs [B,T,H*ndir]."""
        if dp is not None:
            dh_n = self._unpool_grad(dp)
            dtype = dp.dtype
        else:
            dtype = d_top_out.dtype
            dh_n = np.zeros(
                (self.num_layers, self.ndir, x.shape[0], self.H), dtype=dtype
            )
        d_next_inp = None  # grad wrt input of layer l+1
        for l in range(self.num_layers - 1, -1, -1):
            if d_next_inp is None:
                d_layer_out = (
                    d_top_out if d_top_out is not None else np.zeros(
                        (x.shape[0], x.shape[1], self.H * self.ndir), dtype=dtype
                    )
                )
            else:
                d_layer_out = d_next_inp
                if tape.drop_masks[l] is not None:
                    d_layer_out = d_layer_out * tape.drop_masks[l]
            d_inp_total = None
            for d in range(self.ndir):
                d_out_dir = d_layer_out[:, :, d * self.H : (d + 1) * self.H]
                d_inp = self._backward_direction(
                    l, d, tape.caches[l * self.ndir + d], tape.layer_inputs[l],
                    d_out_dir, dh_n[l, d], grads,
                )
                d_inp_total = d_inp if d_inp_total is None else d_inp_total + d_inp
            d_next_inp = d_inp_total
        # embedding scatter-add
        np.add.at(grads["emb"], x.reshape(-1), d_next_inp.reshape(-1, d_next_inp.shape[-1]))

    def loss_and_grads(self, x1, len1, x2, len2, y, train=True):
        """Mean CE loss + gradient dict. y ∈ {0,1} [B]."""
        B = x1.shape[0]
        mode = self.pooling_mode
        seq = mode in self._SEQ_POOLING
        lens1 = np.asarray(len1, dtype=np.int64)
        lens2 = np.asarray(len2, dtype=np.int64)
        h1, tape1 = self._encode_tape(x1, len1, train)
        h2, tape2 = self._encode_tape(x2, len2, train)
        if seq:
            p1, ctx1 = self._pool_seq_forward(tape1.final_input, lens1)
            p2, ctx2 = self._pool_seq_forward(tape2.final_input, lens2)
        else:
            p1 = self._pool_final(h1)
            p2 = self._pool_final(h2)
        if mode in self._FOUR_WAY:
            comb = np.concatenate([p1, p2, p1 * p2, p1 - p2], axis=1)
        elif mode == "hstates_layers_simple":
            comb = np.concatenate([p1, p2], axis=1)
        elif mode == "hstates_subtract":
            diff = p1 - p2
            comb = 1.0 - np.abs(diff)
        else:  # hstates_l2_distance
            diff = p1 - p2
            comb = 1.0 - diff * diff
        drop1 = drop2 = None
        if train and self.fc_dropout[0] > 0:
            drop1 = (self.rng.random(comb.shape) >= self.fc_dropout[0]) / (1 - self.fc_dropout[0])
            comb_d = comb * drop1
        else:
            comb_d = comb
        a1_pre = comb_d @ self.w["fc1.W"].T + self.w["fc1.b"]
        a1 = np.maximum(a1_pre, 0.0)
        if train and self.fc_dropout[1] > 0:
            drop2 = (self.rng.random(a1.shape) >= self.fc_dropout[1]) / (1 - self.fc_dropout[1])
            a1_d = a1 * drop2
        else:
            a1_d = a1
        logits = a1_d @ self.w["fc2.W"].T + self.w["fc2.b"]
        m = logits.max(axis=1, keepdims=True)
        e = np.exp(logits - m)
        probs = e / e.sum(axis=1, keepdims=True)
        eps = 1e-12
        loss = -np.log(probs[np.arange(B), y] + eps).mean()

        grads = {k: np.zeros_like(v) for k, v in self.w.items()}
        d_logits = probs.copy()
        d_logits[np.arange(B), y] -= 1.0
        d_logits /= B
        grads["fc2.W"] += d_logits.T @ a1_d
        grads["fc2.b"] += d_logits.sum(axis=0)
        d_a1 = d_logits @ self.w["fc2.W"]
        if drop2 is not None:
            d_a1 = d_a1 * drop2
        d_a1 = d_a1 * (a1_pre > 0)
        grads["fc1.W"] += d_a1.T @ comb_d
        grads["fc1.b"] += d_a1.sum(axis=0)
        d_comb = d_a1 @ self.w["fc1.W"]
        if drop1 is not None:
            d_comb = d_comb * drop1
        D = p1.shape[1]
        if mode in self._FOUR_WAY:
            dp1 = d_comb[:, :D] + d_comb[:, 2 * D : 3 * D] * p2 + d_comb[:, 3 * D :]
            dp2 = d_comb[:, D : 2 * D] + d_comb[:, 2 * D : 3 * D] * p1 - d_comb[:, 3 * D :]
        elif mode == "hstates_layers_simple":
            dp1 = d_comb[:, :D]
            dp2 = d_comb[:, D:]
        elif mode == "hstates_subtract":
            sgn = np.sign(diff)
            dp1 = -sgn * d_comb
            dp2 = sgn * d_comb
        else:  # hstates_l2_distance
            dp1 = -2.0 * diff * d_comb
            dp2 = 2.0 * diff * d_comb
        if seq:
            d_top1 = self._pool_seq_backward(tape1.final_input, lens1, dp1, ctx1, grads)
            d_top2 = self._pool_seq_backward(tape2.final_input, lens2, dp2, ctx2, grads)
            self._backward_leg(x1, tape1, None, grads, d_top_out=d_top1)
            self._backward_leg(x2, tape2, None, grads, d_top_out=d_top2)
        else:
            self._backward_leg(x1, tape1, dp1, grads)
            self._backward_leg(x2, tape2, dp2, grads)
        preds = logits.argmax(axis=1)
        return loss, grads, preds


class Adam:
    def __init__(self, params: dict[str, np.ndarray], lr=1e-3, betas=(0.9, 0.999),
                 eps=1e-8, frozen: tuple[str, ...] = ()):
        self.params = params
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}
        # freeze iff name contains any entry (rnn_networks.py:216-221)
        self.frozen_keys = {k for k in params if any(f in k for f in frozen)}

    def step(self, grads: dict[str, np.ndarray]) -> None:
        self.t += 1
        for k, p in self.params.items():
            if k in self.frozen_keys:
                continue
            g = grads[k]
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mhat = self.m[k] / (1 - self.b1 ** self.t)
            vhat = self.v[k] / (1 - self.b2 ** self.t)
            p -= (self.lr * mhat / (np.sqrt(vhat) + self.eps)).astype(p.dtype)


def classification_metrics(y_true: np.ndarray, y_pred: np.ndarray) -> dict[str, float]:
    """accuracy / per-class precision-recall / macro & weighted F1
    (reference computes these via sklearn, rnn_networks.py:415-419)."""
    out = {"accuracy": float((y_true == y_pred).mean()) if len(y_true) else 0.0}
    f1s, weights = [], []
    for cls in (0, 1):
        tp = int(((y_pred == cls) & (y_true == cls)).sum())
        fp = int(((y_pred == cls) & (y_true != cls)).sum())
        fn = int(((y_pred != cls) & (y_true == cls)).sum())
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[f"precision_{cls}"] = prec
        out[f"recall_{cls}"] = rec
        out[f"f1_{cls}"] = f1
        f1s.append(f1)
        weights.append(int((y_true == cls).sum()))
    out["macro_f1"] = sum(f1s) / 2
    tot = sum(weights)
    out["weighted_f1"] = (
        sum(f * w for f, w in zip(f1s, weights)) / tot if tot else 0.0
    )
    return out


def fit(
    trainer: SiameseTrainer,
    train_data: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    valid_data=None,
    epochs: int = 5,
    batch_size: int = 256,
    lr: float = 1e-3,
    shuffle: bool = True,
    seed: int = 123,
    early_stopping_patience: int = -1,
    validation_every: int = 1,
    frozen: tuple[str, ...] = (),
    log=print,
) -> dict:
    """Epoch loop mirroring rnn_networks.fit (:302-520). Returns history;
    ``trainer.w`` holds the best-validation weights at exit when
    validation ran, else the final weights (:509-520)."""
    x1, l1, x2, l2, y = train_data
    n = len(y)
    rng = np.random.default_rng(seed)
    opt = Adam(trainer.w, lr=lr, frozen=frozen)
    history = {"train_loss": [], "valid_loss": [], "train_acc": [],
               "valid_acc": [], "train_macro_f1": [], "valid_macro_f1": [],
               "train_precision_1": [], "train_recall_1": [], "epoch_sec": []}
    best_valid = np.inf
    best_weights = None
    patience = 0
    import time as _time

    for epoch in range(epochs):
        _t_epoch = _time.time()
        order = rng.permutation(n) if shuffle else np.arange(n)
        tot_loss = 0.0
        preds_all, y_all = [], []
        nb = 0
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            loss, grads, preds = trainer.loss_and_grads(
                x1[idx], l1[idx], x2[idx], l2[idx], y[idx], train=True
            )
            opt.step(grads)
            tot_loss += loss
            nb += 1
            preds_all.append(preds)
            y_all.append(y[idx])
        m = classification_metrics(np.concatenate(y_all), np.concatenate(preds_all))
        history["train_loss"].append(tot_loss / max(nb, 1))
        history["train_acc"].append(m["accuracy"])
        history["train_macro_f1"].append(m["macro_f1"])
        history["train_precision_1"].append(m["precision_1"])
        history["train_recall_1"].append(m["recall_1"])
        msg = f"epoch {epoch+1}/{epochs} loss={tot_loss/max(nb,1):.4f} acc={m['accuracy']:.4f}"
        if valid_data is not None and validation_every and (epoch + 1) % max(validation_every, 1) == 0:
            vloss, vm = evaluate(trainer, valid_data, batch_size)
            history["valid_loss"].append(vloss)
            history["valid_acc"].append(vm["accuracy"])
            history["valid_macro_f1"].append(vm["macro_f1"])
            msg += f" valid_loss={vloss:.4f} valid_acc={vm['accuracy']:.4f}"
            if vloss < best_valid:
                best_valid = vloss
                best_weights = {k: v.copy() for k, v in trainer.w.items()}
                patience = 0
            else:
                patience += 1
                if early_stopping_patience > 0 and patience >= early_stopping_patience:
                    history["epoch_sec"].append(_time.time() - _t_epoch)
                    log(msg + "  [early stop]")
                    break
        history["epoch_sec"].append(_time.time() - _t_epoch)
        log(msg)
    if best_weights is not None:
        trainer.w.update(best_weights)
    return history


def evaluate(trainer: SiameseTrainer, data, batch_size=256) -> tuple[float, dict]:
    x1, l1, x2, l2, y = data
    tot, nb = 0.0, 0
    preds_all = []
    for s in range(0, len(y), batch_size):
        sl = slice(s, s + batch_size)
        loss, _, preds = trainer.loss_and_grads(
            x1[sl], l1[sl], x2[sl], l2[sl], y[sl], train=False
        )
        tot += loss
        nb += 1
        preds_all.append(preds)
    return tot / max(nb, 1), classification_metrics(y, np.concatenate(preds_all))
