"""Four-panel sample visualization (GT vs prediction), matplotlib.

Equivalent of the reference's samplevis figure
(pytorch-sandbox/hmdegopose/samplevis.py:20-134): per evaluated frame a
2x2 panel — (1) hand joints projected in 2-D, (2) object model points
projected in 2-D, (3) 3-D top view (x/z), (4) 3-D side view (y/z) — ground
truth in blue, prediction in red, over the input image where applicable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def draw_samplevis(
    image: np.ndarray,
    camera_matrix: np.ndarray,
    gt_hand: Optional[np.ndarray] = None,
    pred_hand: Optional[np.ndarray] = None,
    gt_points: Optional[np.ndarray] = None,
    pred_points: Optional[np.ndarray] = None,
    save_path: Optional[str] = None,
):
    """Render the 4-panel figure; returns the figure (saves+closes if path given).

    Args:
        image: (H, W, 3) uint8 RGB.
        gt_hand / pred_hand: (21, 3) camera-frame joints.
        gt_points / pred_points: (P, 3) camera-frame transformed model points.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def project(p):
        z = np.clip(p[:, 2], 1e-6, None)
        u = camera_matrix[0, 0] * p[:, 0] / z + camera_matrix[0, 2]
        v = camera_matrix[1, 1] * p[:, 1] / z + camera_matrix[1, 2]
        return np.stack([u, v], axis=1)

    fig, axes = plt.subplots(2, 2, figsize=(10, 10))

    # panel 1: hand joints 2-D over the image
    ax = axes[0, 0]
    ax.imshow(image)
    ax.set_title("hand joints (2D)")
    for data, color, label in ((gt_hand, "tab:blue", "gt"), (pred_hand, "tab:red", "pred")):
        if data is not None:
            uv = project(np.reshape(data, (21, 3)))
            ax.scatter(uv[:, 0], uv[:, 1], s=12, c=color, label=label)
    ax.legend(loc="lower right")
    ax.set_axis_off()

    # panel 2: object model points 2-D over the image
    ax = axes[0, 1]
    ax.imshow(image)
    ax.set_title("object points (2D)")
    for data, color in ((gt_points, "tab:blue"), (pred_points, "tab:red")):
        if data is not None:
            uv = project(np.asarray(data))
            ax.scatter(uv[:, 0], uv[:, 1], s=2, c=color, alpha=0.5)
    ax.set_axis_off()

    # panels 3/4: 3-D top (x/z) and side (y/z) views
    for ax, (i, j), title in ((axes[1, 0], (0, 2), "top view (x/z)"),
                              (axes[1, 1], (1, 2), "side view (y/z)")):
        for data, color in ((gt_points, "tab:blue"), (pred_points, "tab:red")):
            if data is not None:
                d = np.asarray(data)
                ax.scatter(d[:, i], d[:, j], s=2, c=color, alpha=0.5)
        for data, color in ((gt_hand, "tab:blue"), (pred_hand, "tab:red")):
            if data is not None:
                d = np.reshape(data, (21, 3))
                ax.scatter(d[:, i], d[:, j], s=14, c=color, marker="x")
        ax.set_title(title)
        ax.set_aspect("equal", adjustable="datalim")

    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=80)
        plt.close(fig)
    return fig
