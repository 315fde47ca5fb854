"""Fused on-device augmentation pipeline.

Functional-parity target: the reference's CPU numpy/OpenCV transform chain —
``bf/preprocessing/transforms.py`` + ``functional/img.py`` + ``functional/
box.py`` (photometric jitter, RandomExpand, OneOf(RandomCrop...),
flips, Resize, ToFloatTensor, Normalize).

TPU-first re-design: instead of materializing intermediate images per
transform on the host, all *geometry* composes into a single per-image
affine view ``[X, Y] = t + D @ [x, y]`` mapping current-frame pixels to
staged-image coordinates, where ``D`` is a signed permutation (so flips and
90-degree rotations are sign/axis changes, crops/expands are translations) —
and the entire batch is produced by ONE bilinear resample with out-of-bounds
fill, then photometric + normalize fuse in.  Because every geometric
transform is a pure update of ``(D, t, frame size, boxes)``, transforms
compose exactly in ANY config order (the reference's arbitrary-composition
contract, transforms.py:13-25) and ``OneOf`` may select over any of them.
Rejection sampling (the reference's 50 sequential crop attempts,
functional/img.py:55-83) becomes 50 *parallel* candidates with a first-accept
argmax.  Everything is fixed-shape, vmapped over the batch, and jitted.

Box bookkeeping (shift / clip / keep-criterion masks) follows
functional/box.py:61-97 exactly, with padded ``[G, R]`` arrays + validity
masks replacing variable-length filtering.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

ATTEMPTS = 50


# ---------------------------------------------------------------------------
# photometric ops (float32 images in [0, 255])
# ---------------------------------------------------------------------------

def yuv420_to_rgb(packed, size):
    """Packed planar YUV420 ``[B, H*W*3//2]`` uint8 -> RGB uint8 ``[B,H,W,3]``.

    Inverse of the native YUV staging path (native/decode.cpp
    decode_batch_yuv420 / data/native.rgb_to_yuv420): bilinear chroma
    upsample (half-pixel centers, matching the 2x2 subsample convention)
    + BT.601 full-range matrix, fused into the on-device pipeline.  The
    point is bandwidth: staged batches cross the host->device link at 1.5
    bytes/pixel instead of 3.
    """
    w, h = size
    n = h * w
    q = (h // 2) * (w // 2)
    y = packed[:, :n].reshape(-1, h, w).astype(jnp.float32)
    cb = packed[:, n:n + q].reshape(-1, h // 2, w // 2).astype(jnp.float32)
    cr = packed[:, n + q:].reshape(-1, h // 2, w // 2).astype(jnp.float32)

    def up(c):
        return jax.image.resize(c, (c.shape[0], h, w), method='linear')

    cb = up(cb) - 128.0
    cr = up(cr) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def _rgb_to_hsv(rgb):
    """RGB [0,1] -> HSV with h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    # arithmetic selects (jnp.choose lowers to gathers — slow on TPU)
    def pick(opts):
        out = opts[0]
        for k in range(1, 6):
            out = jnp.where(i == k, opts[k], out)
        return out
    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_brightness(rng, img, max_delta, p):
    """img += u(-d, d) * 255 (parity: transforms.py:106-117)."""
    k1, k2 = jax.random.split(rng)
    delta = jax.random.uniform(k1, (), minval=-max_delta, maxval=max_delta) * 255.0
    apply = jax.random.uniform(k2) < p
    return jnp.clip(img + jnp.where(apply, delta, 0.0), 0.0, 255.0)


def adjust_contrast(rng, img, delta_range, p):
    """mean-anchored scale (parity: transforms.py:119-131)."""
    k1, k2 = jax.random.split(rng)
    scale = jax.random.uniform(k1, (), minval=delta_range[0], maxval=delta_range[1])
    scale = jnp.where(jax.random.uniform(k2) < p, scale, 1.0)
    mean = jnp.mean(img.reshape(-1, 3), axis=0)
    return jnp.clip(mean + scale * (img - mean), 0.0, 255.0)


def adjust_hue_saturation(rng, img, max_hue_delta, saturation_delta_range, p):
    """HSV hue shift (wraparound) + saturation scale
    (parity: transforms.py:133-169)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 255.0) / 255.0)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    if max_hue_delta is not None:
        delta = jax.random.uniform(k1, (), minval=-max_hue_delta, maxval=max_hue_delta)
        h = (h + delta) % 1.0
    if saturation_delta_range is not None:
        scale = jax.random.uniform(k2, (), minval=saturation_delta_range[0],
                                   maxval=saturation_delta_range[1])
        s = jnp.clip(s * scale, 0.0, 1.0)
    out = _hsv_to_rgb(jnp.stack([h, s, v], axis=-1)) * 255.0
    apply = jax.random.uniform(k3) < p
    return jnp.where(apply, out, img)


# ---------------------------------------------------------------------------
# geometric ops on the (window, boxes, mask) state
# ---------------------------------------------------------------------------
# State: cur_w, cur_h — size of the virtual current image;
#        D [2,2] signed permutation, t [2] — current-frame pixel (x, y) maps
#        to staged coords [X, Y] = t + D @ [x, y] (expand windows go out of
#        bounds; flips negate a column of D; rot90 swaps D's columns);
#        valid [4] — staged-coords rect (x0, y0, x1, y1, inclusive) still
#        visible: crops shrink it so a later expand pads with fill instead of
#        re-revealing cropped-away content (the reference materializes each
#        crop, functional/img.py:55-83 — integer crop offsets make the
#        pixel-granularity mask exact);
#        boxes [G, R] in current-frame coords; mask [G].


def identity_state(src_w, src_h, boxes, mask):
    """Initial state: the current frame IS the staged image."""
    return (jnp.float32(src_w), jnp.float32(src_h),
            jnp.eye(2, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
            jnp.asarray([0.0, 0.0, src_w - 1.0, src_h - 1.0], jnp.float32),
            boxes, mask)


def expand_op(rng, state, aspect_ratio_range, area_range, p):
    """Canvas expansion with mean fill (parity: functional/img.py:85-113).

    Picks the first of 50 parallel candidates with new size >= current.
    """
    cur_w, cur_h, D, t, valid, boxes, mask = state
    k_ar, k_area, k_off, k_p = jax.random.split(rng, 4)
    ar = jax.random.uniform(k_ar, (ATTEMPTS,), minval=aspect_ratio_range[0],
                            maxval=aspect_ratio_range[1])
    area = jax.random.uniform(k_area, (ATTEMPTS,), minval=area_range[0],
                              maxval=area_range[1]) * cur_w * cur_h
    new_w = jnp.floor(jnp.sqrt(area * ar))
    new_h = jnp.floor(jnp.sqrt(area / ar))
    ok = (new_w >= cur_w) & (new_h >= cur_h)
    idx = jnp.argmax(ok)  # first valid candidate
    any_ok = jnp.any(ok)
    apply = (jax.random.uniform(k_p) < p) & any_ok
    new_w = jnp.where(apply, new_w[idx], cur_w)
    new_h = jnp.where(apply, new_h[idx], cur_h)
    u = jax.random.uniform(k_off, (2,))
    xmin = jnp.floor(u[0] * (new_w - cur_w + 1))
    ymin = jnp.floor(u[1] * (new_h - cur_h + 1))
    xmin = jnp.where(apply, xmin, 0.0)
    ymin = jnp.where(apply, ymin, 0.0)

    boxes = boxes.at[:, 0].add(xmin).at[:, 2].add(xmin)
    boxes = boxes.at[:, 1].add(ymin).at[:, 3].add(ymin)
    # new-frame pixel x' sees old content at x = x' - xmin
    t = t - D @ jnp.stack([xmin, ymin])
    return (new_w, new_h, D, t, valid, boxes, mask)


def _crop_candidate_accept(boxes, mask, region, min_iou, keep_criterion,
                           min_objects_kept):
    """Evaluate one crop candidate (parity: functional/box.py:61-90).

    Returns (accept, keep_mask, clipped_boxes).
    """
    b = boxes[:, :4]
    inter = jnp.concatenate([jnp.maximum(b[:, :2], region[:2]),
                             jnp.minimum(b[:, 2:], region[2:])], axis=-1)
    degenerate = (inter[:, 2:] < inter[:, :2]).any(axis=-1)
    inter = jnp.where(degenerate[:, None], 0.0, inter)

    def area(x):
        return (jnp.clip(x[:, 2] - x[:, 0], 0, None)
                * jnp.clip(x[:, 3] - x[:, 1], 0, None))

    # reference computes iou(original, clipped) elementwise (box.py:70-71);
    # intersection(original, clipped) == clipped, so iou = |clipped| / |orig|
    ia = area(inter)
    iou = jnp.where(area(b) > 0, ia / jnp.maximum(area(b), 1e-12), 0.0)

    has_boxes = jnp.any(mask)
    max_iou = jnp.max(jnp.where(mask, iou, -1.0))

    if keep_criterion == 'center_point':
        center = (b[:, :2] + b[:, 2:]) / 2
        keep = ((center > region[:2]) & (center < region[2:])).all(axis=-1)
    elif keep_criterion == 'iou':
        keep = iou > min_iou
    else:
        raise ValueError(f'Wrong value for keep_criterion: {keep_criterion}')
    keep = keep & mask

    accept = jnp.where(has_boxes,
                       (max_iou > min_iou) & (jnp.sum(keep) >= min_objects_kept),
                       True)
    return accept, keep, inter


def crop_op(rng, state, min_iou=0.5, aspect_ratio_range=(0.5, 2.0),
            area_range=(0.1, 1.0), keep_criterion='center_point',
            min_objects_kept=1, p=0.5):
    """Rejection-sampled crop as 50 parallel candidates, first accept wins
    (parity: functional/img.py:55-83 + box.py:61-90)."""
    cur_w, cur_h, D, t, valid, boxes, mask = state
    k_ar, k_area, k_off, k_p = jax.random.split(rng, 4)
    ar = jax.random.uniform(k_ar, (ATTEMPTS,), minval=aspect_ratio_range[0],
                            maxval=aspect_ratio_range[1])
    area = jax.random.uniform(k_area, (ATTEMPTS,), minval=area_range[0],
                              maxval=area_range[1]) * cur_w * cur_h
    new_w = jnp.floor(jnp.sqrt(area * ar))
    new_h = jnp.floor(jnp.sqrt(area / ar))
    fits = (new_w <= cur_w) & (new_h <= cur_h) & (new_w >= 1) & (new_h >= 1)
    u = jax.random.uniform(k_off, (ATTEMPTS, 2))
    xmin = jnp.floor(u[:, 0] * (cur_w - new_w + 1))
    ymin = jnp.floor(u[:, 1] * (cur_h - new_h + 1))
    regions = jnp.stack([xmin, ymin, xmin + new_w - 1, ymin + new_h - 1], axis=-1)

    eval_one = functools.partial(_crop_candidate_accept,
                                 boxes, mask,
                                 min_iou=min_iou,
                                 keep_criterion=keep_criterion,
                                 min_objects_kept=min_objects_kept)
    accepts, keeps, inters = jax.vmap(lambda r: eval_one(region=r))(regions)
    accepts = accepts & fits

    idx = jnp.argmax(accepts)  # first accepted attempt (parity with the loop)
    apply = jnp.any(accepts) & (jax.random.uniform(k_p) < p)

    sel_region = regions[idx]
    sel_w, sel_h = new_w[idx], new_h[idx]
    sel_keep = keeps[idx]
    sel_boxes = inters[idx]

    # shift into crop frame + clip (box.py:82-88)
    shifted = jnp.stack([
        jnp.clip(sel_boxes[:, 0] - sel_region[0], 0, sel_w - 1),
        jnp.clip(sel_boxes[:, 1] - sel_region[1], 0, sel_h - 1),
        jnp.clip(sel_boxes[:, 2] - sel_region[0], 0, sel_w - 1),
        jnp.clip(sel_boxes[:, 3] - sel_region[1], 0, sel_h - 1),
    ], axis=-1)
    new_boxes = jnp.where(apply, jnp.concatenate([shifted, boxes[:, 4:]], -1),
                          boxes)
    new_mask = jnp.where(apply, sel_keep, mask)
    out_w = jnp.where(apply, sel_w, cur_w)
    out_h = jnp.where(apply, sel_h, cur_h)
    # new-frame pixel x' sees old content at x = x' + xmin
    shift = jnp.where(apply, sel_region[:2], jnp.zeros(2))
    t = t + D @ shift
    # the crop discards everything outside the new frame: intersect the
    # valid rect with the new frame's staged-coords footprint
    p0 = t
    p1 = t + D @ jnp.stack([out_w - 1.0, out_h - 1.0])
    lo = jnp.minimum(p0, p1)
    hi = jnp.maximum(p0, p1)
    new_valid = jnp.stack([jnp.maximum(valid[0], lo[0]),
                           jnp.maximum(valid[1], lo[1]),
                           jnp.minimum(valid[2], hi[0]),
                           jnp.minimum(valid[3], hi[1])])
    valid = jnp.where(apply, new_valid, valid)
    return (out_w, out_h, D, t, valid, new_boxes, new_mask)


def hflip_op(rng, state, p):
    """Horizontal mirror of the current frame (parity: functional/img.py:19-26
    + box.py:21-27) as a window-map update: composes exactly with any later
    expand/crop/rotate instead of being deferred to the final resample."""
    cur_w, cur_h, D, t, valid, boxes, mask = state
    flip = jax.random.uniform(rng) < p
    flipped = jnp.stack([cur_w - 1 - boxes[:, 2], boxes[:, 1],
                         cur_w - 1 - boxes[:, 0], boxes[:, 3]], axis=-1)
    boxes = jnp.where(flip, jnp.concatenate([flipped, boxes[:, 4:]], -1), boxes)
    # new-frame x' sees old content at x = cur_w - 1 - x'
    t = jnp.where(flip, t + D @ jnp.stack([cur_w - 1.0, jnp.float32(0.0)]), t)
    D = jnp.where(flip, D * jnp.asarray([[-1.0, 1.0], [-1.0, 1.0]]), D)
    return (cur_w, cur_h, D, t, valid, boxes, mask)


def vflip_op(rng, state, p):
    """Vertical mirror (parity: functional/img.py:28-35 + box.py:29-31)."""
    cur_w, cur_h, D, t, valid, boxes, mask = state
    flip = jax.random.uniform(rng) < p
    flipped = jnp.stack([boxes[:, 0], cur_h - 1 - boxes[:, 3],
                         boxes[:, 2], cur_h - 1 - boxes[:, 1]], axis=-1)
    boxes = jnp.where(flip, jnp.concatenate([flipped, boxes[:, 4:]], -1), boxes)
    t = jnp.where(flip, t + D @ jnp.stack([jnp.float32(0.0), cur_h - 1.0]), t)
    D = jnp.where(flip, D * jnp.asarray([[1.0, -1.0], [1.0, -1.0]]), D)
    return (cur_w, cur_h, D, t, valid, boxes, mask)


_ROT = jnp.asarray([[0.0, -1.0], [1.0, 0.0]])  # one 90-degree step


def rot90_op(rng, state):
    """Random 90-degree rotation of the current frame (parity:
    functional/img.py:37-53 + box.py:33-59).

    Window-space: one rotation step maps new-frame (x', y') to old-frame
    (s-1-y', x'), i.e. ``D @= ROT`` and ``t += D @ [s-1, 0]`` — so it may
    appear ANYWHERE in the transform order.  Exact array rotation semantics
    (the reference's ``warpAffine`` about ``(S/2, S/2)`` misaligns by half a
    pixel for even sizes); boxes rotate corner-exactly.  Like the reference
    (img.py:40 ``assert height == width``) a square frame is required; where
    the reference crashes on non-square frames, this op is a no-op instead
    (data-dependent raise is impossible under jit).
    """
    cur_w, cur_h, D, t, valid, boxes, mask = state
    k = jax.random.randint(rng, (), 0, 4)
    square = cur_w == cur_h
    s = cur_w  # == cur_h whenever the rotation applies

    def rot_boxes_once(b4):
        # frame pixel (x, y) -> (y, s-1-x) under one rotation
        return jnp.stack([b4[:, 1], s - 1 - b4[:, 2],
                          b4[:, 3], s - 1 - b4[:, 0]], axis=-1)

    d_vars, t_vars, b_vars = [D], [t], [boxes[:, :4]]
    for _ in range(3):
        Dp, tp = d_vars[-1], t_vars[-1]
        t_vars.append(tp + Dp @ jnp.stack([s - 1.0, jnp.float32(0.0)]))
        d_vars.append(Dp @ _ROT)
        b_vars.append(rot_boxes_once(b_vars[-1]))

    sel = [(k == i) & (square | (i == 0)) for i in range(4)]
    sel[0] = sel[0] | ~square
    D = jnp.select(sel, d_vars)
    t = jnp.select(sel, t_vars)
    b4 = jnp.select(sel, b_vars)
    return (cur_w, cur_h, D, t, valid,
            jnp.concatenate([b4, boxes[:, 4:]], axis=-1), mask)


# ---------------------------------------------------------------------------
# final gather
# ---------------------------------------------------------------------------

def sample_view(img, window, out_size, fill):
    """Bilinear resample of the affine view ``window = (cur_w, cur_h, D, t)``
    (staged coords, may be OOB) to ``out_size`` — the fusion of
    expand/crop/flip/rotate/resize.

    TPU-first: ``D`` is a signed permutation, so the view stays
    axis-separable; instead of gathers (slow on TPU) it is computed as two
    MXU matmuls with per-image interpolation matrices:
      ``out = Ry @ img' @ Rx^T + (1 - coverage) * fill``
    where ``R[i, j] = relu(1 - |src_coord_i - j|)`` are exactly the bilinear
    weights, ``img'`` is the (possibly axis-swapped, for odd rotations)
    staged image, rows of out-of-bounds coordinates sum < 1, and the coverage
    deficit blends in the fill color — matching gather-with-OOB-fill
    semantics bit-for-bit at boundaries.
    """
    out_w, out_h = out_size
    cur_w, cur_h, D, t, valid = window
    assert img.shape[0] == img.shape[1], 'staged images must be square'
    src = img.shape[0]

    xs = (jnp.arange(out_w) + 0.5) * cur_w / out_w - 0.5  # frame x per out col
    ys = (jnp.arange(out_h) + 0.5) * cur_h / out_h - 0.5  # frame y per out row

    # staged X = t0 + D00*x + D01*y ; staged Y = t1 + D10*x + D11*y.
    # Exactly one term of each is nonzero.  When D is diagonal,
    # out[r, c] = img[Y(r), X(c)]; when anti-diagonal (odd rotation),
    # out[r, c] = img[Y(c), X(r)] = imgT[X(r), Y(c)] — same two-matmul form
    # over the transposed image.
    swap = jnp.abs(D[0, 1]) > 0.5
    row_coords = jnp.where(swap, t[0], t[1]) + (D[0, 1] + D[1, 1]) * ys
    col_coords = jnp.where(swap, t[1], t[0]) + (D[1, 0] + D[0, 0]) * xs

    grid = jnp.arange(src)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(row_coords[:, None] - grid[None, :]))
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(col_coords[:, None] - grid[None, :]))

    # staged pixels cropped away earlier (outside the valid rect) read as
    # fill: zero their interpolation weights so the coverage deficit blends
    # the fill color in (crop offsets are integers — the mask is exact)
    row_lo = jnp.where(swap, valid[0], valid[1])
    row_hi = jnp.where(swap, valid[2], valid[3])
    col_lo = jnp.where(swap, valid[1], valid[0])
    col_hi = jnp.where(swap, valid[3], valid[2])
    gridf = grid.astype(jnp.float32)
    ry = ry * ((gridf >= row_lo) & (gridf <= row_hi))[None, :]
    rx = rx * ((gridf >= col_lo) & (gridf <= col_hi))[None, :]

    img_f = img.astype(jnp.float32)
    img_f = jnp.where(swap, jnp.transpose(img_f, (1, 0, 2)), img_f)
    tmp = jnp.einsum('yi,ijc->yjc', ry, img_f,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum('yjc,xj->yxc', tmp, rx,
                     preferred_element_type=jnp.float32)
    coverage = ry.sum(axis=1)[:, None] * rx.sum(axis=1)[None, :]
    return out + (1.0 - coverage)[..., None] * fill


# ---------------------------------------------------------------------------
# pipeline assembly from reference-schema config lists
# ---------------------------------------------------------------------------

PHOTOMETRIC_KINDS = ('brightness', 'contrast', 'hue_saturation')
GEOMETRIC_KINDS = ('rot90', 'expand', 'crop', 'hflip', 'vflip')


def _entry_contains(entry, kinds) -> bool:
    """True if a parsed stage entry is (or a nested OneOf branch is) one of
    ``kinds``."""
    kind, kw = entry
    if kind == 'oneof':
        return any(_entry_contains(b, kinds) for b in kw)
    return kind in kinds


def _apply_photo(kind, kw, key, img):
    """Apply one photometric transform to the staged image."""
    if kind == 'brightness':
        return adjust_brightness(key, img, kw['max_delta'], kw['p'])
    if kind == 'contrast':
        return adjust_contrast(key, img, kw['delta_range'], kw['p'])
    if kind == 'hue_saturation':
        return adjust_hue_saturation(key, img, kw['max_hue_delta'],
                                     kw['saturation_delta_range'], kw['p'])
    raise AssertionError(f'unknown photometric kind: {kind}')


def _apply_stage(kind, kw, key, img, state):
    """Apply one transform to the ``(staged image, window/box state)`` pair.

    Photometric kinds update the staged image; geometric kinds update the
    window/box state; ``oneof`` evaluates every branch — photometric,
    geometric, or nested ``oneof`` alike (parity: the reference's OneOf
    accepts any transform, transforms.py:19-25) — and selects one uniformly
    via ``jnp.select`` over both carriers.

    Per-position semantics caveat: brightness/hue-saturation are pointwise,
    so applying them to the staged image commutes with the final resample
    (up to bilinear interpolation) regardless of where they sit in the
    chain.  ``RandomAdjustContrast`` is NOT pointwise — its anchor is the
    image mean — so when it appears AFTER a geometric transform its mean is
    taken over the full staged image rather than the cropped/expanded view
    the reference would use.  Shipped reference configs always order
    photometric before geometric (samples/*.py), where the semantics match
    exactly.
    """
    if kind in PHOTOMETRIC_KINDS:
        return _apply_photo(kind, kw, key, img), state
    if kind == 'identity':
        return img, state
    if kind == 'rot90':
        return img, rot90_op(key, state)
    if kind == 'expand':
        return img, expand_op(key, state, kw['aspect_ratio_range'],
                              kw['area_range'], kw['p'])
    if kind == 'crop':
        return img, crop_op(key, state, **kw)
    if kind == 'hflip':
        return img, hflip_op(key, state, kw['p'])
    if kind == 'vflip':
        return img, vflip_op(key, state, kw['p'])
    if kind == 'oneof':
        k_pick, k_op = jax.random.split(key)
        pick = jax.random.randint(k_pick, (), 0, len(kw))
        results = [_apply_stage(bk, bkw, k_op, img, state)
                   for bk, bkw in kw]
        if len(results) == 1:
            return results[0]
        return jax.tree_util.tree_map(
            lambda *xs: (xs[0] if all(x is xs[0] for x in xs) else
                         jnp.select([pick == i for i in range(len(xs))],
                                    [jnp.asarray(x) for x in xs])),
            *results)
    raise AssertionError(f'unknown transform kind: {kind}')

class Pipeline:
    """Config-driven batched augmentation+preprocessing
    (parity: data_builder.py:17-25 ``create_preprocessing``).

    ``__call__(rng, images, boxes, mask)``:
      images uint8/float ``[B, S, S, 3]`` staged RGB,
      boxes ``[B, G, R>=4]`` staged pixel coords, mask ``[B, G]``
    -> normalized float images ``[B, H, W, 3]``, transformed boxes, mask.
    """

    def __init__(self,
                 augmentations: Sequence[dict] = (),
                 preprocessing: Sequence[dict] = (),
                 input_size: Tuple[int, int] = (300, 300),
                 train: bool = True,
                 staging_yuv: Optional[Tuple[int, int]] = None):
        self.input_size = tuple(input_size)
        # (w, h) when batches arrive as packed planar YUV420 (loader
        # staging_colorspace='yuv420'): reconstruct RGB on-device first —
        # inside the same jitted program, so the conversion fuses with the
        # augmentation chain
        self.staging_yuv = tuple(staging_yuv) if staging_yuv else None
        # transforms run in config order (the reference applies Compose
        # sequentially, transforms.py:13-17); photometric entries update the
        # staged image, geometric ones the window/box state
        self.stages: List[Tuple[str, Any]] = []
        self.divisor = 1.0
        self.mean = None
        self.std = None

        specs = list(augmentations) if train else []
        for spec in specs:
            entry = self._parse_one(spec)
            if entry is not None:
                self.stages.append(entry)

        # Contrast anchored after a MEAN-CHANGING geometric transform
        # deviates from the reference: its mean is taken over the full
        # staged image, not the cropped/expanded view (see _apply_stage
        # docstring).  Flips/rot90 preserve the pixel multiset, so only
        # crop/expand actually move the mean anchor.  Shipped reference
        # configs never order it that way; warn loudly when a user config
        # does instead of silently diverging.
        geo_seen = False
        for entry in self.stages:
            if geo_seen and _entry_contains(entry, ('contrast',)):
                warnings.warn(
                    'RandomAdjustContrast placed after RandomCrop/'
                    'RandomExpand: its mean anchor is the full staged '
                    'image, not the cropped/expanded view the reference '
                    'would use (pixel-level deviation; boxes are '
                    'unaffected). Order photometric transforms before '
                    'geometric ones for exact reference semantics.',
                    stacklevel=2)
                break
            if _entry_contains(entry, ('crop', 'expand')):
                geo_seen = True

        for spec in preprocessing:
            name = spec['name']
            args = dict(spec.get('args', {}))
            if name == 'ToFloatTensor':
                if args.get('normalize', False):
                    self.divisor = 255.0
            elif name == 'Normalize':
                self.mean = tuple(args['mean'])
                self.std = tuple(args['std'])
            elif name == 'Resize':
                self.input_size = tuple(args['size'])
            else:
                raise NotImplementedError(f'Unsupported preprocessing: {name}')

        self._jitted = jax.jit(self._run_batch)

    def _parse_one(self, spec):
        """One config transform spec -> (kind, kwargs), or None for no-ops.

        Every geometric kind is a pure update of the window/box state, so
        any order — and any nesting under ``OneOf`` — is supported (parity:
        the reference composes transforms freely, transforms.py:13-25).
        """
        name = spec['name']
        args = dict(spec.get('args', {}))
        p = args.pop('p', 0.5)
        if name in ('ToFloat', 'ToUint8'):
            return None  # dtype staging is implicit on-device
        if name == 'Identity':
            return ('identity', {})
        if name == 'RandomRotate':
            return ('rot90', {})
        if name == 'RandomAdjustBrightness':
            return ('brightness', {
                'max_delta': args['max_brightness_delta'], 'p': p})
        if name == 'RandomAdjustContrast':
            return ('contrast', {
                'delta_range': tuple(args['contrast_delta_range']), 'p': p})
        if name == 'RandomAdjustHueSaturation':
            return ('hue_saturation', {
                'max_hue_delta': args.get('max_hue_delta'),
                'saturation_delta_range':
                    tuple(args['saturation_delta_range'])
                    if args.get('saturation_delta_range') else None,
                'p': p})
        if name == 'RandomExpand':
            return ('expand', {
                'aspect_ratio_range': tuple(args.get('aspect_ratio_range', (0.5, 2.0))),
                'area_range': tuple(args.get('area_range', (1.0, 16.0))),
                'p': p})
        if name == 'RandomCrop':
            return ('crop', _crop_args(args, p))
        if name == 'RandomHorizontalFlip':
            return ('hflip', {'p': p})
        if name == 'RandomVerticalFlip':
            return ('vflip', {'p': p})
        if name == 'OneOf':
            branches = []
            for sub in args['transforms']:
                entry = self._parse_one(sub)
                if entry is None:
                    entry = ('identity', {})
                branches.append(entry)
            return ('oneof', branches)
        raise NotImplementedError(f'Unsupported augmentation: {name}')

    def _run_one(self, rng, img, boxes, mask):
        img = img.astype(jnp.float32)
        keys = jax.random.split(rng, len(self.stages))

        state = identity_state(img.shape[1], img.shape[0], boxes, mask)
        for key, (kind, kw) in zip(keys, self.stages):
            img, state = _apply_stage(kind, kw, key, img, state)

        fill = jnp.mean(img, axis=(0, 1))  # expand fill (functional/img.py:105)

        cur_w, cur_h, D, t, valid, boxes, mask = state
        out_w, out_h = self.input_size

        out = sample_view(img, (cur_w, cur_h, D, t, valid), (out_w, out_h),
                          fill)

        # box resize to output frame + clip (functional/box.py:8-19)
        sx = out_w / cur_w
        sy = out_h / cur_h
        resized = jnp.stack([
            jnp.clip(boxes[:, 0] * sx, 0, out_w - 1),
            jnp.clip(boxes[:, 1] * sy, 0, out_h - 1),
            jnp.clip(boxes[:, 2] * sx, 0, out_w - 1),
            jnp.clip(boxes[:, 3] * sy, 0, out_h - 1),
        ], axis=-1)
        boxes = jnp.concatenate([resized, boxes[:, 4:]], axis=-1)

        # degenerate boxes are dropped (detection_dataset.py:31-33)
        degenerate = ((boxes[:, 0] == boxes[:, 2]) | (boxes[:, 1] == boxes[:, 3]))
        mask = mask & ~degenerate

        out = out / self.divisor
        if self.mean is not None:
            out = (out - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        return out, boxes, mask

    def _run_batch(self, rng, images, boxes, mask):
        if self.staging_yuv is not None and images.ndim == 2:
            images = yuv420_to_rgb(images, self.staging_yuv)
        keys = jax.random.split(rng, images.shape[0])
        return jax.vmap(self._run_one)(keys, images, boxes, mask)

    def __call__(self, rng, images, boxes, mask):
        return self._jitted(rng, images, boxes, mask)


def _crop_args(args: dict, p: float) -> dict:
    return {
        'min_iou': args.get('min_iou', 0.5),
        'aspect_ratio_range': tuple(args.get('aspect_ratio_range', (0.5, 2.0))),
        'area_range': tuple(args.get('area_range', (0.1, 1.0))),
        'keep_criterion': args.get('keep_criterion', 'center_point'),
        'min_objects_kept': args.get('min_objects_kept', 1),
        'p': p,
    }
