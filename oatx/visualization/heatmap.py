"""Cross-modality attention heatmaps (numpy/PIL).

Re-implements the reference visualization sidecar's per-word word→patch attention
renders (/root/reference/Visualization/.../visualize.py:120-217) without cv2:
  attn = softmax(word_embed · patch_embeds^T · d^-0.5) over the N=14² patches,
  bilinearly upsampled to the frame, JET-colormapped, blended 50/50 with the
  frame, concatenated with the raw frame and a caption strip.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

_STOPWORDS = {
    "a", "an", "the", "is", "are", "was", "were", "be", "being", "been", "am",
    "do", "does", "did", "will", "would", "can", "could", "of", "in", "on",
    "at", "to", "from", "with", "by", "for", "and", "or", "but", "not", "no",
    "this", "that", "these", "those", "it", "its", "his", "her", "their",
    "there", "here", "very", "so", "such", "as", "than", "then", "into",
    "over", "under", "up", "down", "out", "about", "some", "any", "each",
    "has", "have", "had", "he", "she", "they", "we", "you", "i",
}


def is_probable_noun(word: str) -> bool:
    """Noun filter (reference uses nltk POS tags, visualize.py:13-21). Uses nltk
    when its data is available, else a stopword/suffix heuristic."""
    w = word.lower().strip(".,!?;:'\"")
    if not w or w in _STOPWORDS:
        return False
    try:
        import nltk

        tag = nltk.pos_tag([w])[0][1]
        return tag.startswith("NN")
    except Exception:
        if w.endswith(("ing", "ed", "ly")):
            return False
        return w.isalpha()


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """x in [0,1] → RGB uint8 with the classic JET map (cv2.COLORMAP_JET)."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    four_x = 4.0 * x
    r = np.clip(np.minimum(four_x - 1.5, -four_x + 4.5), 0, 1)
    g = np.clip(np.minimum(four_x - 0.5, -four_x + 3.5), 0, 1)
    b = np.clip(np.minimum(four_x + 0.5, -four_x + 2.5), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def bilinear_upsample(grid: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w) float grid → (out_h, out_w), half-pixel-center bilinear."""
    from PIL import Image

    im = Image.fromarray(np.asarray(grid, np.float32), mode="F")
    return np.asarray(im.resize((out_w, out_h), Image.BILINEAR))


def _normalize01(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def word_patch_attention(
    word_embed: np.ndarray, patch_embeds: np.ndarray, scale: Optional[float] = None
) -> np.ndarray:
    """softmax(word · patches^T · scale) → (N,) attention over patches.

    Both inputs are L2-normalized first (reference visualize.py:155-170);
    scale defaults to d^-0.5."""
    w = np.asarray(word_embed, np.float32).reshape(-1)
    p = np.asarray(patch_embeds, np.float32)
    w = w / (np.linalg.norm(w) + 1e-8)
    p = p / (np.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    if scale is None:
        scale = float(len(w)) ** -0.5
    logits = p @ w * scale
    logits -= logits.max()
    e = np.exp(logits)
    return e / e.sum()


def render_heatmap_frame(
    attn: np.ndarray,
    frame_rgb: np.ndarray,
    grid_size: Optional[Tuple[int, int]] = None,
    label: Optional[str] = None,
    caption: Optional[str] = None,
    value_range: str = "unit",
) -> np.ndarray:
    """attn (N,) over patches + frame (H, W, 3 uint8) → [heat|frame] panel with
    optional caption strip → RGB uint8.

    Float frames are interpreted by the explicit value_range contract ('unit'
    = [0,1] scaled ×255, '255' = already [0,255]) — never by inspecting the
    data range, which would brighten a genuinely dark [0,255] frame."""
    from PIL import Image, ImageDraw

    h, w = frame_rgb.shape[:2]
    n = attn.size
    if grid_size is None:
        g = int(round(np.sqrt(n)))
        grid_size = (g, g)
    cam = _normalize01(bilinear_upsample(attn.reshape(grid_size), h, w))
    heat = jet_colormap(cam)
    # show the ACTUAL frame (uint8 passthrough / clip), not a per-frame
    # min-max stretch — a near-uniform frame would otherwise render black and
    # the 50/50 heat blend would no longer overlay the real input
    f = np.asarray(frame_rgb)
    if f.dtype != np.uint8:
        if value_range == "unit":
            f = np.clip(f, 0.0, 1.0) * 255
        elif value_range == "255":
            f = np.clip(f, 0, 255)
        else:
            raise ValueError(f"value_range must be 'unit' or '255', got {value_range!r}")
    frame = f.astype(np.uint8)
    blend = (heat // 2 + frame // 2).astype(np.uint8)

    if label:
        im = Image.fromarray(blend)
        ImageDraw.Draw(im).text((8, 8), label, fill=(255, 0, 0))
        blend = np.asarray(im)

    panel = np.concatenate([blend, frame], axis=1)
    if caption:
        strip = Image.new("RGB", (panel.shape[1], 50), (255, 255, 255))
        d = ImageDraw.Draw(strip)
        max_chars = 60
        for j in range(0, len(caption), max_chars):
            d.text((8, 4 + 14 * (j // max_chars)), caption[j: j + max_chars],
                   fill=(255, 0, 0))
        panel = np.concatenate([panel, np.asarray(strip)], axis=0)
    return panel


def render_featmap(
    patch_embeds: np.ndarray,
    frame_rgb: np.ndarray,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Feature-map-only mode (reference feat_map_visualize, visualize.py:92-117):
    channel-mean of the patch embeddings as a CAM, JET-blended with the frame,
    concatenated with the raw frame."""
    n = patch_embeds.shape[0]
    g = int(round(np.sqrt(n)))
    cam = np.mean(np.asarray(patch_embeds, np.float32), axis=-1).reshape(g, g)
    panel = render_heatmap_frame(_normalize01(cam).reshape(-1), frame_rgb)
    if out_path:
        from PIL import Image

        Image.fromarray(panel).save(out_path)
    return panel


def render_caption_heatmaps(
    caption: str,
    word_embeds: Sequence[np.ndarray],
    patch_embeds: np.ndarray,
    frame_rgb: np.ndarray,
    out_prefix: str,
    nouns_only: bool = True,
) -> List[str]:
    """Per-word heatmap PNGs for (the nouns of) a caption → list of paths.

    word_embeds[i] corresponds to caption.split()[i] (the caller supplies
    per-word text-tower embeddings, as the reference queries its text model per
    word — visualize.py:150-152)."""
    from PIL import Image

    words = caption.split(" ")
    out_paths = []
    for i, word in enumerate(words):
        if i >= len(word_embeds):
            break
        if nouns_only and not is_probable_noun(word):
            continue
        attn = word_patch_attention(word_embeds[i], patch_embeds)
        panel = render_heatmap_frame(attn, frame_rgb, label=word, caption=caption)
        path = f"{out_prefix}_token_{i}.png"
        Image.fromarray(panel).save(path)
        out_paths.append(path)
    return out_paths
