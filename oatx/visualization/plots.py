"""Offline analysis plots (reference utils/visualization/*.py equivalents):
bbox overlays, video-text-object panels, and t-SNE embedding maps."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def draw_bboxes(
    frame_rgb: np.ndarray,
    bboxes_norm: np.ndarray,
    labels: Optional[Sequence[str]] = None,
    color=(255, 32, 32),
) -> np.ndarray:
    """Overlay normalized [x1,y1,x2,y2,...] boxes on a frame → RGB uint8
    (reference msrvtt_3f_vto_visualize region plots)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.asarray(frame_rgb, np.uint8)).convert("RGB")
    d = ImageDraw.Draw(im)
    h, w = frame_rgb.shape[:2]
    for i, box in enumerate(np.asarray(bboxes_norm)):
        x1, y1, x2, y2 = box[0] * w, box[1] * h, box[2] * w, box[3] * h
        d.rectangle([x1, y1, x2, y2], outline=color, width=2)
        if labels is not None and i < len(labels):
            d.text((x1 + 2, max(0, y1 - 12)), str(labels[i]), fill=color)
    return np.asarray(im)


def video_text_object_panel(
    frames_rgb: np.ndarray,
    caption: str,
    bboxes_norm: Optional[np.ndarray] = None,
    tags: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """N frames side by side (first frame with bbox overlays) + caption strip
    (reference msrvtt_3f_vto_visualize.py panels)."""
    from PIL import Image, ImageDraw

    frames = [np.asarray(f, np.uint8) for f in frames_rgb]
    if bboxes_norm is not None:
        frames[0] = draw_bboxes(frames[0], bboxes_norm, tags)
    row = np.concatenate(frames, axis=1)
    strip = Image.new("RGB", (row.shape[1], 28), (255, 255, 255))
    ImageDraw.Draw(strip).text((6, 6), caption[:120], fill=(0, 0, 0))
    return np.concatenate([row, np.asarray(strip)], axis=0)


def tsne_embedding_plot(
    embeddings: np.ndarray,
    labels: Optional[np.ndarray] = None,
    out_path: str = "tsne.png",
    perplexity: float = 10.0,
    title: str = "learned embeddings (t-SNE)",
) -> str:
    """2-D t-SNE scatter of learned embeddings (reference
    learned_embedding_visualization.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    n = len(embeddings)
    if n < 2:
        raise ValueError(f"t-SNE needs at least 2 samples, got {n}")
    xy = TSNE(n_components=2,
              perplexity=min(perplexity, max(1, n // 3), n - 1),
              init="pca", random_state=0).fit_transform(np.asarray(embeddings))
    fig, ax = plt.subplots(figsize=(6, 6))
    if labels is not None:
        sc = ax.scatter(xy[:, 0], xy[:, 1], c=np.asarray(labels), cmap="tab10", s=18)
        fig.colorbar(sc, ax=ax, shrink=0.8)
    else:
        ax.scatter(xy[:, 0], xy[:, 1], s=18)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
