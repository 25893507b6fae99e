"""Training/eval plotting utilities (vestigial reference surface).

Rebuilds the reference's matplotlib helpers with the output directory as an
explicit argument instead of the global cfg.graph_dir:
  * save_plot  -- /root/reference/lib/utils/funcs_utils.py:211-231
  * plot_joint_error -- /root/reference/lib/utils/vis_utils.py:247-276
Neither is on the scoring path (the training code is vestigial in the
reference, SURVEY.md section 2.13), but they complete the library surface.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Sequence

import numpy as np


def save_plot(data_list: Sequence[float], epoch: int, graph_dir: str,
              title: str = "Train Loss") -> str:
    """Loss-curve pdf with the reference's layout: per-epoch line, legend,
    unit x-ticks, and a min-value annotation (funcs_utils.py:211-231).
    Returns the written path ('train_loss.pdf' for the default title)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = plt.figure()
    plot_title = "{} epoch {}".format(title, epoch)
    save_path = "_".join(title.split(" ")).lower() + ".pdf"

    plt.plot(np.arange(1, len(data_list) + 1), data_list, "b-", label=plot_title)
    plt.legend()
    plt.title(plot_title)
    plt.xlabel("epoch")
    plt.xlim(left=0, right=len(data_list) + 1)
    plt.xticks(np.arange(0, len(data_list) + 1, 1.0), fontsize=5)

    min_value = np.asarray(data_list).min()
    plt.annotate(
        "%0.2f" % min_value, xy=(1, min_value), xytext=(8, 0),
        arrowprops=dict(arrowstyle="simple", connectionstyle="angle3"),
        xycoords=("axes fraction", "data"), textcoords="offset points",
    )

    os.makedirs(graph_dir, exist_ok=True)
    out = osp.join(graph_dir, save_path)
    f.savefig(out)
    plt.close(f)
    return out


def plot_joint_error(mpjpe: np.ndarray, mpjve: np.ndarray, mpjae: np.ndarray,
                     graph_dir: str) -> tuple[str, str]:
    """Per-frame error plots, parity with the reference (vis_utils.py:247-276):
    'mpjpe.jpg' (position error) and 'mpjve_&_mpjae.jpg' (velocity + angle
    error, the angle series zero-padded by one like the reference's
    concatenate). Returns the two written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mpjae = np.concatenate((np.asarray(mpjae), np.zeros((1,))))
    os.makedirs(graph_dir, exist_ok=True)

    f = plt.figure()
    plot_title = "MPJPE"
    path1 = osp.join(graph_dir, "_".join(plot_title.split(" ")).lower() + ".jpg")
    plt.plot(np.arange(1, len(mpjpe) + 1), mpjpe, "b-", label="MPJPE")
    plt.legend()
    plt.title(plot_title)
    plt.xlabel("frame")
    plt.xlim(left=0, right=len(mpjpe) + 1)
    plt.xticks(np.arange(0, len(mpjpe) + 1, 50.0), fontsize=5)
    f.savefig(path1)
    plt.close(f)

    f = plt.figure()
    plot_title = "MPJVE & MPJAE"
    path2 = osp.join(graph_dir, "_".join(plot_title.split(" ")).lower() + ".jpg")
    plt.plot(np.arange(1, len(mpjve) + 1), mpjve, "b-", label="MPJVE")
    plt.plot(np.arange(1, len(mpjae) + 1), mpjae, "r-", label="MPJAE")
    plt.legend()
    plt.title(plot_title)
    plt.xlabel("frame")
    plt.xlim(left=0, right=len(mpjve) + 1)
    plt.xticks(np.arange(0, len(mpjve) + 1, 50.0), fontsize=5)
    f.savefig(path2)
    plt.close(f)
    return path1, path2
