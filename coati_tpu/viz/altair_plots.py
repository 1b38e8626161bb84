"""Altair charting (optional `altair` dependency).

Parity targets: coati/math_tools/altair_plots.py:10-58 (roc_plot) and
coati/generative/embed_altair.py:9-81 (t-SNE embedding scatter with
molecule-image tooltips and a category selector).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from sklearn.metrics import auc, roc_curve

try:
    import altair as alt

    alt.data_transformers.disable_max_rows()
    HAS_ALTAIR = True
except ImportError:
    HAS_ALTAIR = False


def require_altair() -> None:
    if not HAS_ALTAIR:
        raise ImportError("altair is required for this chart but is not installed.")


def roc_data(source, y_true="y", y_pred="y_pred", partition_col=None):
    """ROC curves + auROC per partition as plain DataFrames (works
    without altair; roc_plot wraps this in a chart)."""
    frames = []
    if partition_col is not None:
        parts = [("train", "train"), ("test", "test")]
        for name, part in parts:
            sub = source[source[partition_col] == part]
            fpr, tpr, _ = roc_curve(y_true=sub[y_true], y_score=sub[y_pred])
            df = pd.DataFrame(
                {"False Positive Rate": fpr, "True Positive Rate": tpr}
            )
            df[partition_col] = f"{name} - auROC: {round(auc(fpr, tpr), 3)}"
            frames.append(df)
        return pd.concat(frames)
    fpr, tpr, _ = roc_curve(y_true=source[y_true], y_score=source[y_pred])
    df = pd.DataFrame({"False Positive Rate": fpr, "True Positive Rate": tpr})
    df.attrs["auROC"] = round(auc(fpr, tpr), 3)
    return df


def roc_plot(source, y_true="y", y_pred="y_pred", partition_col=None, chart_args=None):
    require_altair()
    if chart_args is None:
        chart_args = {"height": 400, "width": 400}
    data = roc_data(source, y_true, y_pred, partition_col)
    if partition_col is not None:
        return (
            alt.Chart(data, **chart_args)
            .mark_line()
            .encode(
                x="False Positive Rate", y="True Positive Rate", color=partition_col
            )
        )
    return (
        alt.Chart(data, **chart_args)
        .mark_line()
        .encode(x="False Positive Rate", y="True Positive Rate")
        .properties(title=f"auROC: {data.attrs['auROC']}")
    )


def tsne_coords(embs: np.ndarray, seed: int = 0) -> np.ndarray:
    from sklearn.manifold import TSNE

    return TSNE(
        n_components=2, learning_rate=100, init="random", random_state=seed
    ).fit_transform(np.asarray(embs))


def embed_altair(
    df,
    tooltip_fields=["smiles", "mol_index"],
    selector_field="library",
    quantity="FOLDOVER_ALL_MEDIAN",
    image_tooltip=True,
    emb_field="emb",
    smiles_field="smiles",
    width=1024,
    height=768,
):
    """t-SNE scatter of embeddings with molecule-image tooltips."""
    require_altair()
    from coati_tpu.viz.plots import image_formatter2, wrapped_get_smiles_image

    df["image"] = (
        df[smiles_field].apply(wrapped_get_smiles_image).apply(image_formatter2).copy()
    )
    df["mol_index"] = range(df.shape[0])

    selector = None
    if selector_field is not None:
        substrate_frame = pd.DataFrame(
            {selector_field: df[selector_field].unique().tolist()}
        )
        selection = alt.selection_point(fields=[selector_field])
        color1 = alt.condition(
            selection, alt.Color(f"{selector_field}:N"), alt.value("lightgray")
        )
        selector = (
            alt.Chart(substrate_frame)
            .mark_rect()
            .encode(y=selector_field, color=color1)
            .add_params(selection)
        )

    tooltip = [alt.Tooltip(field=f, title=f) for f in tooltip_fields]
    if image_tooltip:
        tooltip.append("image")

    coords = tsne_coords(np.stack(df[emb_field].values.tolist(), 0))
    df.loc[:, "X"] = coords[:, 0]
    df.loc[:, "Y"] = coords[:, 1]

    chart = (
        alt.Chart(df)
        .mark_circle(size=60)
        .encode(
            x=alt.X("X:Q", scale=alt.Scale(zero=False)),
            y=alt.Y("Y:Q", scale=alt.Scale(zero=False)),
            color=alt.Color(f"{quantity}:Q", scale=alt.Scale(range=["orange", "blue"])),
            opacity=alt.value(0.5),
            tooltip=tooltip,
        )
        .properties(title="", width=int(width), height=height)
    )
    if selector is not None:
        return alt.hconcat(selector, chart.transform_filter(selection))
    return chart
