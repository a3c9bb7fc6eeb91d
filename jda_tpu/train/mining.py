"""On-device hard-negative mining screen.

The reference mines negatives by cropping one window at a time from a
background image, resizing it, and running the partial cascade on it
(src/jda/data.cpp:885-1012, NegGenerator::NextImage + the OpenMP miner).
A TPU port of that loop is transfer-bound: shipping candidate pixels over
the device link costs ~4 KB/window while the verdict is one bit, and at
late-cascade false-positive rates (<1e-2) essentially all shipped bytes
are thrown away.

Here the *backgrounds* live on device and the windows never exist on the
host at all:

  * each scan state's current background is uploaded once (~50 KB) into a
    slot of a resident [n_states, Hmax, Wmax] uint8 tensor;
  * a window (y, x, w) -> img_o_size crop+bilinear-resize is synthesized
    on device as two small matmuls per state: out = Ry @ bg @ Rx^T, where
    Ry/Rx are the 2-tap bilinear interpolation operators of the w ->
    img_o_size resize, shifted by the window origin (built by broadcast
    compares, contracted on the MXU — zero gathers);
  * the partial cascade (Trainer.make_validator's device core) runs on the
    synthesized patches in place; only a boolean verdict per window and
    two stat scalars come back;
  * the ~1% accepted windows are re-cropped on the host with cv2 (exact
    reference pixel semantics, data.cpp:957-960) and re-validated in one
    small batch, so everything that enters the corpus is bit-identical to
    the host mining path.  The device screen's float bilinear may differ
    from cv2's 11-bit fixed-point arithmetic in the last bit, which can
    flip a borderline verdict — acceptance is stochastic across seeds
    anyway (the reference's miner is OpenMP-racy, common.cpp:233-238).

Window *enumeration* is exactly NegGenerator.next_window's stream; a
one-slot pushback per state lets each batch group a state's windows by
(background, window-size) so the resize operators stay static per group.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jda_tpu.config import Config
from jda_tpu.data import NegGenerator, patch_row


def _bilinear_taps(w: int, size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """2-tap row/col operators of cv2.resize(img[w, w], (size, size)),
    INTER_LINEAR: out[i] = wf0[i]*src[t0[i]] + wf1[i]*src[t1[i]]."""
    src = (np.arange(size, dtype=np.float64) + 0.5) * (w / size) - 0.5
    t0 = np.floor(src).astype(np.int64)
    frac = (src - t0).astype(np.float32)
    t0c = np.clip(t0, 0, w - 1)
    t1c = np.clip(t0 + 1, 0, w - 1)
    # when both taps clamp to the same pixel the weights must still sum to 1
    wf1 = np.where(t0 < 0, 1.0, np.where(t0 + 1 > w - 1, 0.0, frac)).astype(
        np.float32
    )
    return (
        t0c.astype(np.int32),
        t1c.astype(np.int32),
        (1.0 - wf1).astype(np.float32),
        wf1,
    )


def _make_synth(
    S: int, P: int, H: int, W: int, sizes: Tuple[int, ...], D: int
):
    """jit: resident backgrounds + PACKED window params -> (flat rows,
    initial shapes, validity).  All per-batch host data crosses the link
    as exactly two arrays (one i32, one f32) and the whole screen batch
    is consumed on device — the relay round-trip count, not bandwidth or
    compute, bounds mining throughput.

    sizes is the tuple of patch sizes to synthesize into the row: (o,) for
    single-scale models, (o, h, q) for multi-scale models (whose features
    read the HALF/QUARTER patches too, common.hpp:68-104); patch k lands
    at flat-row offset sum(sizes[:k]^2).

    ipack row s: [ys(P) | xs(P) | (t0(sz) | t1(sz)) per size | valid(P)]
    i32.  fpack: [(wf0(S*sz) | wf1(S*sz)) per size | shift (S*P*2)] f32."""

    def synth(bgs_u8, ipack, fpack, ms):
        ys = ipack[:, :P]
        xs = ipack[:, P : 2 * P]
        col = 2 * P
        taps = []
        for sz in sizes:
            taps.append((ipack[:, col : col + sz], ipack[:, col + sz : col + 2 * sz]))
            col += 2 * sz
        valid = ipack[:, col:] != 0
        fb = 0
        wfs = []
        for sz in sizes:
            wfs.append(
                (
                    fpack[fb : fb + S * sz].reshape(S, sz),
                    fpack[fb + S * sz : fb + 2 * S * sz].reshape(S, sz),
                )
            )
            fb += 2 * S * sz
        shift = fpack[fb:].reshape(S * P, 2)
        iota_h = jnp.arange(H, dtype=jnp.int32)
        iota_w = jnp.arange(W, dtype=jnp.int32)
        flat = jnp.zeros((S * P, D), jnp.int32)
        off = 0
        for (t0, t1), (wf0, wf1), size in zip(taps, wfs, sizes):
            outs = []
            for s in range(S):
                bg = bgs_u8[s].astype(jnp.float32)  # [H, W]
                # Ry[p, i, h]: bilinear row operator shifted by window origin
                r0 = ys[s][:, None, None] + t0[s][None, :, None]  # [P, sz, 1]
                r1 = ys[s][:, None, None] + t1[s][None, :, None]
                ry = (r0 == iota_h) * wf0[s][None, :, None] + (
                    r1 == iota_h
                ) * wf1[s][None, :, None]  # [P, sz, H]
                tmp = jnp.einsum(
                    "pih,hw->piw",
                    ry,
                    bg,
                    precision=jax.lax.Precision.HIGHEST,
                )
                c0 = xs[s][:, None, None] + t0[s][None, :, None]
                c1 = xs[s][:, None, None] + t1[s][None, :, None]
                rx = (c0 == iota_w) * wf0[s][None, :, None] + (
                    c1 == iota_w
                ) * wf1[s][None, :, None]  # [P, sz, W]
                patch = jnp.einsum(
                    "piw,pjw->pij",
                    tmp,
                    rx,
                    precision=jax.lax.Precision.HIGHEST,
                )
                outs.append(patch)
            patches = jnp.concatenate(outs)  # [S*P, sz, sz]
            pix = jnp.clip(jnp.floor(patches + 0.5), 0, 255).astype(jnp.int32)
            flat = flat.at[:, off : off + size * size].set(
                pix.reshape(S * P, -1)
            )
            off += size * size
        # interleaved [x0, y0, x1, y1, ...] layout: tile, not repeat (repeat
        # would spread the x-shift over the first L coords)
        shapes = ms[None, :] + jnp.tile(shift, (1, ms.shape[0] // 2))
        return flat.reshape(-1), shapes, valid.reshape(-1)

    return jax.jit(synth)


_pack_results = jax.jit(
    lambda alive, valid, nvis: jnp.concatenate(
        [
            (alive & valid).astype(jnp.int32),
            jnp.stack(
                [
                    jnp.sum(((~alive) & valid).astype(jnp.int32)),
                    jnp.sum(jnp.where((~alive) & valid, nvis, 0)),
                ]
            ),
        ]
    )
)


class DeviceMiner:
    """Device-resident mining pipeline over a NegGenerator's scan states.

    Usable once the hard pool is drained (hard-pool patches have no
    backing background to synthesize from).  Multi-scale configs
    synthesize the HALF/QUARTER patches on device too (_make_synth
    sizes); exact host revalidation keeps stored rows bit-identical to
    the host mining path either way.
    """

    def __init__(self, gen: NegGenerator, c: Config, per_state: int = 1024):
        self.gen = gen
        self.c = c
        self.P = per_state
        S = gen.n_states
        self._pending: List[Optional[Tuple[int, int, int, int]]] = [None] * S
        self._slot_ver = [-1] * S
        self._bgs_dev = None
        self._hw = (0, 0)
        self._taps_cache: Dict[int, Tuple] = {}
        self._synth = None
        self._synth_key = None

    @property
    def applicable(self) -> bool:
        g = self.gen
        return all(st.hd_idx >= len(g.hards) for st in g.states)

    # -- proposal grouping --------------------------------------------------

    def _collect(self):
        """One batch of proposals: per state, up to P windows sharing
        (background, win_size); a boundary-crossing window is pushed back
        for the next batch."""
        g = self.gen
        S = g.n_states
        P = self.P
        groups = []
        for sid in range(S):
            st = g.states[sid]
            ys = np.zeros(P, np.int32)
            xs = np.zeros(P, np.int32)
            n = 0
            w0 = ver0 = bg0 = None
            if self._pending[sid] is not None:
                y, x, w, ver = self._pending[sid]
                self._pending[sid] = None
                w0, ver0 = w, ver
                bg0 = st.bg_img  # pending always belongs to the CURRENT bg
                ys[0], xs[0] = y, x
                n = 1
            while n < P:
                kind, payload = g.next_window(sid)
                if kind == "hard":
                    # hard pool resurfaced (shouldn't happen mid-stream);
                    # push nothing, let the host path consume it later
                    raise RuntimeError("hard pool entry in device miner")
                y, x, w = payload
                ver = st.bg_ver
                if w0 is None:
                    w0, ver0 = w, ver
                    bg0 = st.bg_img
                elif (w, ver) != (w0, ver0):
                    # boundary: st.bg_img may already be the NEXT bg —
                    # bg0 pinned at group start keeps the group coherent
                    self._pending[sid] = (y, x, w, ver)
                    break
                ys[n], xs[n] = y, x
                n += 1
            groups.append(
                dict(sid=sid, ys=ys, xs=xs, n=n, w=w0, ver=ver0, bg=bg0)
            )
        return groups

    # -- device residency ---------------------------------------------------

    def _ensure_bgs(self, groups) -> None:
        S = self.gen.n_states
        hmax = max(gr["bg"].shape[0] for gr in groups)
        wmax = max(gr["bg"].shape[1] for gr in groups)
        hmax = -(-max(hmax, self._hw[0]) // 64) * 64
        wmax = -(-max(wmax, self._hw[1]) // 64) * 64
        if self._bgs_dev is None or (hmax, wmax) != self._hw:
            self._hw = (hmax, wmax)
            buf = np.zeros((S, hmax, wmax), np.uint8)
            for gr in groups:
                bg = gr["bg"]
                buf[gr["sid"], : bg.shape[0], : bg.shape[1]] = bg
                self._slot_ver[gr["sid"]] = gr["ver"]
            self._bgs_dev = jnp.asarray(buf)
            return
        for gr in groups:
            sid = gr["sid"]
            if self._slot_ver[sid] != gr["ver"]:
                bg = gr["bg"]
                pad = np.zeros(self._hw, np.uint8)
                pad[: bg.shape[0], : bg.shape[1]] = bg
                self._bgs_dev = _slot_update(
                    self._bgs_dev, jnp.asarray(pad), sid
                )
                self._slot_ver[sid] = gr["ver"]

    # -- main ---------------------------------------------------------------

    def generate(
        self,
        validate,
        size: int,
        max_batches: int = 2000,
        rng: Optional[np.random.Generator] = None,
    ):
        """Drop-in for NegGenerator.generate on the device path.  `validate`
        is Trainer.make_validator's closure (carries .validate_dev)."""
        c = self.c
        g = self.gen
        S = g.n_states
        P = self.P
        b = S * P
        # multi-scale models read the h/q patches too — synthesize them
        sizes = (
            (c.img_o_size, c.img_h_size, c.img_q_size)
            if c.multi_scale
            else (c.img_o_size,)
        )
        ssum = sum(sizes)
        D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))
        rng = rng if rng is not None else np.random.default_rng(0)

        acc = []  # (bg ref, y, x, w, shift)
        # over-collect slightly: exact revalidation drops borderline windows
        want = size + max(size // 16, 8)
        nega_n = 0
        carts_n = 0
        n_batches = 0
        pending = []  # 1-deep pipeline: dispatch batch i, harvest i-1

        def harvest(entry):
            nonlocal nega_n, carts_n
            groups_h, shift_h, packed = entry
            arr = np.asarray(packed)
            alive = arr[:b] != 0
            nega_n += int(arr[b])
            carts_n += int(arr[b + 1])
            for flat_i in np.flatnonzero(alive):
                sid, p = divmod(int(flat_i), P)
                gr = groups_h[sid]
                acc.append(
                    (
                        gr["bg"],
                        int(gr["ys"][p]),
                        int(gr["xs"][p]),
                        gr["w"],
                        shift_h[flat_i],
                    )
                )

        while len(acc) < want and n_batches < max_batches:
            n_batches += 1
            groups = self._collect()
            self._ensure_bgs(groups)
            H, W = self._hw
            key = (S, P, H, W, sizes)
            if self._synth_key != key:
                self._synth = _make_synth(S, P, H, W, sizes, D)
                self._synth_key = key
            ipack = np.zeros((S, 3 * P + 2 * ssum), np.int32)
            fpack = np.zeros(2 * S * ssum + 2 * b, np.float32)
            shift = rng.uniform(-c.shift_size, c.shift_size, (b, 2)).astype(
                np.float32
            )
            fpack[2 * S * ssum :] = shift.reshape(-1)
            for gr in groups:
                sid = gr["sid"]
                w = gr["w"]
                ipack[sid, :P] = gr["ys"]
                ipack[sid, P : 2 * P] = gr["xs"]
                col = 2 * P
                fb = 0
                for sz in sizes:
                    if (w, sz) not in self._taps_cache:
                        self._taps_cache[(w, sz)] = _bilinear_taps(w, sz)
                    a, bt, c0, c1 = self._taps_cache[(w, sz)]
                    ipack[sid, col : col + sz] = a
                    ipack[sid, col + sz : col + 2 * sz] = bt
                    col += 2 * sz
                    fpack[fb + sid * sz : fb + (sid + 1) * sz] = c0
                    fpack[fb + S * sz + sid * sz : fb + S * sz + (sid + 1) * sz] = c1
                    fb += 2 * S * sz
                ipack[sid, col : col + gr["n"]] = 1
            flat_dev, shapes_dev, valid_dev = self._synth(
                self._bgs_dev,
                jnp.asarray(ipack),
                jnp.asarray(fpack),
                validate.ms_dev,
            )
            state = validate.validate_dev(flat_dev, shapes_dev, valid_dev, b)
            packed = _pack_results(state["alive"], valid_dev, state["nvis"])
            pending.append((groups, shift, packed))
            if len(pending) > 1:
                harvest(pending.pop(0))
        for entry in pending:
            harvest(entry)

        # exact host rebuild + revalidation of the accepted windows (same
        # initial shifts), so stored rows/scores/shapes are bit-identical
        # to the host mining path
        rows_l, scores_l, shapes_l = [], [], []
        got = 0
        CH = 4096
        for i0 in range(0, len(acc), CH):
            chunk = acc[i0 : i0 + CH]
            rows = np.stack(
                [
                    patch_row(bg[y : y + w, x : x + w], c)
                    for bg, y, x, w, _ in chunk
                ]
            )
            shifts = np.stack([a[4] for a in chunk])
            ok, score, shape, _ = validate(rows, shift=shifts)
            take = np.flatnonzero(ok)[: size - got]
            if len(take):
                rows_l.append(rows[take])
                scores_l.append(score[take])
                shapes_l.append(shape[take])
                got += len(take)
            if got >= size:
                break

        stats = {
            "exhausted": got < size,
            "not_hard": nega_n,
            "avg_reject_carts": carts_n / max(nega_n, 1),
            "fp_rate": got / max(got + nega_n, 1),
            "bg_used": g.report_bg_used(),
        }
        if not rows_l:
            L2 = c.landmark_dim
            return (
                np.zeros((0, D), np.uint8),
                np.zeros(0),
                np.zeros((0, L2)),
                stats,
            )
        return (
            np.concatenate(rows_l),
            np.concatenate(scores_l),
            np.concatenate(shapes_l),
            stats,
        )


_slot_update = jax.jit(
    lambda bgs, pad, sid: jax.lax.dynamic_update_slice(
        bgs, pad[None], (sid, 0, 0)
    ),
    donate_argnums=(0,),
)


# ---------------------------------------------------------------------------
# Canvas-based near-miss mining
# ---------------------------------------------------------------------------

def _trunc_taps(w: int, size: int):
    """One-tap operators of the detection scan's truncated coordinate map
    patch[i] = src[(i * w) // size] (c/jda.c:375-381 — windows are
    subsampled, never resized).  Expressed as degenerate 2-tap operators
    so _make_synth's bilinear synth computes it exactly (wf1 = 0)."""
    t = ((np.arange(size, dtype=np.int64) * w) // size).astype(np.int32)
    return t, t, np.ones(size, np.float32), np.zeros(size, np.float32)


def _trunc_then_bilinear_taps(w: int, o_size: int, sz: int):
    """Composed taps of cv2-bilinear-resize(subsample(canvas, w -> o_size),
    o_size -> sz): the o-patch index of each bilinear tap is mapped through
    the truncation map, weights unchanged (both maps are separable)."""
    t = ((np.arange(o_size, dtype=np.int64) * w) // o_size).astype(np.int32)
    b0, b1, w0, w1 = _bilinear_taps(o_size, sz)
    return t[b0], t[b1], w0, w1


def _box_iou_vec(x0, y0, w, fx, fy, fs):
    """IoU of square windows (x0, y0, w) with the face box (fx, fy, fs)."""
    ix = np.maximum(
        0.0, np.minimum(x0 + w, fx + fs) - np.maximum(x0, fx)
    )
    iy = np.maximum(
        0.0, np.minimum(y0 + w, fy + fs) - np.maximum(y0, fy)
    )
    inter = ix * iy
    return inter / (w * w + fs * fs - inter)


def _subsample(canvas: np.ndarray, x0: int, y0: int, w: int, out: int):
    idx = (np.arange(out, dtype=np.int64) * w) // out
    return canvas[y0 + idx[:, None], x0 + idx[None, :]]


class CanvasHardMiner:
    """Device-batched near-miss mining from host-rendered face canvases.

    generate_hard (data.py) renders one candidate patch per host call —
    on a 1-core host that caps candidate throughput at ~1k/s, and at
    deep-stage acceptance (<1%) a single mining event costs many minutes
    (the round-3/4 wall).  Here the RENDER amortizes: the host renders a
    face CANVAS (face + clutter margin, ~1.5 ms) once, and the device
    extracts dozens-to-hundreds of distinct candidate windows from it per
    batch via the same MXU window-synthesis used by DeviceMiner — with
    TRUNCATION taps, so device pixels are bit-exact to the detection
    scan's coordinate map and to the host rebuild of accepted windows.

    Window geometry per canvas kind (NegGenerator.load_canvas_factory):
      * true face (any_window=False): windows with IoU in
        [lo(difficulty), 0.48] against the face box — off-scale,
        off-center and boundary-IoU negatives in one sampler (the
        near-miss factory's modes 0/1/4 were all window geometry);
      * off-manifold face (any_window=True): REGISTERED windows (the
        positives' own scale/shift band) — the face itself is the
        negative (landmark distortion / occlusion; factory modes 2/3).

    Shares NegGenerator's adaptive difficulty ladder: acceptance below
    10% raises difficulty (factory renders harder faces, window IoU band
    tightens toward 0.48), above 35% lowers it."""

    def __init__(
        self,
        gen: NegGenerator,
        c: Config,
        n_slots: int = 16,
        per_slot: int = 256,
    ):
        self.gen = gen
        self.c = c
        self.S = n_slots
        self.P = per_slot
        self.slots: List[Optional[dict]] = [None] * n_slots
        self._ver = [-1] * n_slots
        self._slot_ver = [-2] * n_slots  # device copy of each slot
        self._next_ver = 0
        self._refresh_ptr = 0
        self._canv_dev = None
        self._hw = (0, 0)
        self._taps_cache: Dict[Tuple[int, int, str], Tuple] = {}
        self._synth = None
        self._synth_key = None

    # -- host side ----------------------------------------------------------

    def _refresh(self, count: int) -> None:
        g = self.gen
        for _ in range(count):
            sid = self._refresh_ptr % self.S
            self._refresh_ptr += 1
            canvas, (fx, fy, fs), any_window = g.canvas_factory(
                g._canvas_cursor, g._hard_difficulty
            )
            g._canvas_cursor += 1
            self.slots[sid] = dict(
                canvas=np.ascontiguousarray(canvas, np.uint8),
                fx=int(fx),
                fy=int(fy),
                fs=int(fs),
                any=bool(any_window),
            )
            self._ver[sid] = self._next_ver
            self._next_ver += 1

    def _sample_windows(self, slot: dict, rng) -> Tuple[int, np.ndarray, np.ndarray, int]:
        """One window size + up to P origins for a slot, honoring its
        negative-window constraint.  Returns (w, ys, xs, n_valid)."""
        P = self.P
        d = self.gen._hard_difficulty
        C = slot["canvas"].shape[0]
        fx, fy, fs = slot["fx"], slot["fy"], slot["fs"]
        fcx, fcy = fx + fs / 2.0, fy + fs / 2.0
        ys = np.zeros(P, np.int32)
        xs = np.zeros(P, np.int32)
        if slot["any"]:
            # registered windows of an off-manifold face: the positives'
            # own tolerance band (make_face: scale 0.95-1.2, center +-5%)
            w = int(round(fs * rng.uniform(0.92, 1.25)))
            w = max(24, min(w, C))
            cx = fcx + rng.uniform(-0.07, 0.07, P) * fs
            cy = fcy + rng.uniform(-0.07, 0.07, P) * fs
            x0 = np.clip(np.round(cx - w / 2), 0, C - w).astype(np.int64)
            y0 = np.clip(np.round(cy - w / 2), 0, C - w).astype(np.int64)
            xs[:], ys[:] = x0, y0
            return w, ys, xs, P
        # true face: boundary-IoU windows only.  lo rises with difficulty
        # so candidates track the cascade's decision boundary; clamped
        # under hi so the band stays non-empty with the 2.0 ladder cap.
        lo = min(0.22 + 0.20 * d, 0.44)
        hi = 0.48
        w = int(round(fs * rng.uniform(0.7, 1.6)))
        w = max(24, min(w, C))
        n = 0
        for _attempt in range(6):
            need = P - n
            if need <= 0:
                break
            k = need * 4
            ang = rng.uniform(0, 2 * np.pi, k)
            dist = rng.uniform(0.0, 0.75 * fs, k)
            cx = fcx + np.cos(ang) * dist
            cy = fcy + np.sin(ang) * dist
            x0 = np.clip(np.round(cx - w / 2), 0, C - w).astype(np.int64)
            y0 = np.clip(np.round(cy - w / 2), 0, C - w).astype(np.int64)
            iou = _box_iou_vec(x0, y0, w, fx, fy, fs)
            keep = np.flatnonzero((iou >= lo) & (iou <= hi))[:need]
            if len(keep):
                xs[n : n + len(keep)] = x0[keep]
                ys[n : n + len(keep)] = y0[keep]
                n += len(keep)
        return w, ys, xs, n

    # -- device residency -----------------------------------------------------

    def _ensure_dev(self) -> None:
        cmax = max(s["canvas"].shape[0] for s in self.slots)
        cmax = -(-max(cmax, self._hw[0]) // 64) * 64
        if self._canv_dev is None or (cmax, cmax) != self._hw:
            self._hw = (cmax, cmax)
            buf = np.zeros((self.S, cmax, cmax), np.uint8)
            for sid, s in enumerate(self.slots):
                cv = s["canvas"]
                buf[sid, : cv.shape[0], : cv.shape[1]] = cv
                self._slot_ver[sid] = self._ver[sid]
            self._canv_dev = jnp.asarray(buf)
            return
        for sid, s in enumerate(self.slots):
            if self._slot_ver[sid] != self._ver[sid]:
                pad = np.zeros(self._hw, np.uint8)
                cv = s["canvas"]
                pad[: cv.shape[0], : cv.shape[1]] = cv
                self._canv_dev = _slot_update(
                    self._canv_dev, jnp.asarray(pad), sid
                )
                self._slot_ver[sid] = self._ver[sid]

    # -- main -----------------------------------------------------------------

    def generate(
        self,
        validate,
        size: int,
        max_batches: int = 200,
        rng: Optional[np.random.Generator] = None,
    ):
        """Same contract as NegGenerator.generate_hard: mine up to `size`
        accepted (row, score, shape) triples, every candidate validated by
        the current partial cascade (data.cpp:983-987)."""
        c = self.c
        g = self.gen
        assert getattr(g, "canvas_factory", None) is not None
        S, P = self.S, self.P
        b = S * P
        rng = rng if rng is not None else np.random.default_rng(0)
        o = c.img_o_size
        sizes = (
            (o, c.img_h_size, c.img_q_size) if c.multi_scale else (o,)
        )
        ssum = sum(sizes)
        D = sum(d * d for d in (c.img_o_size, c.img_h_size, c.img_q_size))

        if any(s is None for s in self.slots):
            self._refresh(self.S)

        acc = []  # (canvas ref, y, x, w, shift)
        nega_n = 0
        carts_n = 0
        n_batches = 0
        pending = []
        want = size + max(size // 16, 8)

        def harvest(entry):
            nonlocal nega_n, carts_n
            slots_h, shift_h, packed = entry
            arr = np.asarray(packed)
            alive = arr[:b] != 0
            nega_n += int(arr[b])
            carts_n += int(arr[b + 1])
            nvalid = int(arr[b + 2])
            naccept = 0
            for flat_i in np.flatnonzero(alive):
                sid, p = divmod(int(flat_i), P)
                cv, w, ys, xs = slots_h[sid]
                naccept += 1
                acc.append(
                    (cv, int(ys[p]), int(xs[p]), w, shift_h[flat_i])
                )
            # adaptive difficulty (same policy as generate_hard; headroom
            # to 2.0 — see data.py generate_hard / train_flagship._d2)
            rate = naccept / max(nvalid, 1)
            if rate < 0.10:
                g._hard_difficulty = min(2.0, g._hard_difficulty + 0.15)
            elif rate > 0.35:
                g._hard_difficulty = max(0.0, g._hard_difficulty - 0.05)

        while len(acc) < want and n_batches < max_batches:
            n_batches += 1
            if n_batches > 1:
                self._refresh(max(1, S // 4))
            self._ensure_dev()
            H, W = self._hw
            key = (S, P, H, W, sizes)
            if self._synth_key != key:
                self._synth = _make_synth(S, P, H, W, sizes, D)
                self._synth_key = key
            ipack = np.zeros((S, 3 * P + 2 * ssum), np.int32)
            fpack = np.zeros(2 * S * ssum + 2 * b, np.float32)
            shift = rng.uniform(-c.shift_size, c.shift_size, (b, 2)).astype(
                np.float32
            )
            fpack[2 * S * ssum :] = shift.reshape(-1)
            slots_h = []
            for sid, slot in enumerate(self.slots):
                w, ys, xs, n = self._sample_windows(slot, rng)
                slots_h.append((slot["canvas"], w, ys, xs))
                ipack[sid, :P] = ys
                ipack[sid, P : 2 * P] = xs
                col = 2 * P
                fb = 0
                for sz in sizes:
                    ck = (w, sz, "t" if sz == o else "tb")
                    if ck not in self._taps_cache:
                        self._taps_cache[ck] = (
                            _trunc_taps(w, o)
                            if sz == o
                            else _trunc_then_bilinear_taps(w, o, sz)
                        )
                    a, bt, c0, c1 = self._taps_cache[ck]
                    ipack[sid, col : col + sz] = a
                    ipack[sid, col + sz : col + 2 * sz] = bt
                    col += 2 * sz
                    fpack[fb + sid * sz : fb + (sid + 1) * sz] = c0
                    fpack[
                        fb + S * sz + sid * sz : fb + S * sz + (sid + 1) * sz
                    ] = c1
                    fb += 2 * S * sz
                ipack[sid, col : col + n] = 1
            flat_dev, shapes_dev, valid_dev = self._synth(
                self._canv_dev,
                jnp.asarray(ipack),
                jnp.asarray(fpack),
                validate.ms_dev,
            )
            state = validate.validate_dev(flat_dev, shapes_dev, valid_dev, b)
            packed = _pack_canvas_results(
                state["alive"], valid_dev, state["nvis"]
            )
            pending.append((slots_h, shift, packed))
            if len(pending) > 1:
                harvest(pending.pop(0))
        for entry in pending:
            harvest(entry)

        # exact host rebuild + revalidation (bit-identical corpus rows)
        rows_l, scores_l, shapes_l = [], [], []
        got = 0
        CH = 4096
        for i0 in range(0, len(acc), CH):
            chunk = acc[i0 : i0 + CH]
            rows = np.stack(
                [
                    patch_row(_subsample(cv, x, y, w, o), c)
                    for cv, y, x, w, _ in chunk
                ]
            )
            shifts = np.stack([a[4] for a in chunk])
            ok, score, shape, _ = validate(rows, shift=shifts)
            take = np.flatnonzero(ok)[: size - got]
            if len(take):
                rows_l.append(rows[take])
                scores_l.append(score[take])
                shapes_l.append(shape[take])
                got += len(take)
            if got >= size:
                break

        stats = {
            "exhausted": got < size,
            "not_hard": nega_n,
            "avg_reject_carts": carts_n / max(nega_n, 1),
            "fp_rate": got / max(got + nega_n, 1),
            "bg_used": 0,
            "difficulty": g._hard_difficulty,
        }
        if not rows_l:
            return (
                np.zeros((0, D), np.uint8),
                np.zeros(0),
                np.zeros((0, c.landmark_dim)),
                stats,
            )
        return (
            np.concatenate(rows_l),
            np.concatenate(scores_l),
            np.concatenate(shapes_l),
            stats,
        )


_pack_canvas_results = jax.jit(
    lambda alive, valid, nvis: jnp.concatenate(
        [
            (alive & valid).astype(jnp.int32),
            jnp.stack(
                [
                    jnp.sum(((~alive) & valid).astype(jnp.int32)),
                    jnp.sum(jnp.where((~alive) & valid, nvis, 0)),
                    jnp.sum(valid.astype(jnp.int32)),
                ]
            ),
        ]
    )
)
