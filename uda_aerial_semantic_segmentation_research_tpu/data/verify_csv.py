"""Sanity-check the class_dict_seg.csv schema.

Counterpart of reference src/data/verify_csv.py:4-13.
"""

from __future__ import annotations

import os

from uda_aerial_semantic_segmentation_research_tpu.config import Config


def verify_csv(csv_path: str | None = None):
    """Print columns/dtypes/head of the class dictionary CSV."""
    import pandas as pd

    csv_path = csv_path or os.path.join(Config.DATA_DIR, "class_dict_seg.csv")
    df = pd.read_csv(csv_path, skipinitialspace=True)
    print(f"Columns: {list(df.columns)}")
    print(f"Dtypes:\n{df.dtypes}")
    print(f"Head:\n{df.head()}")
    return df


if __name__ == "__main__":
    verify_csv()
