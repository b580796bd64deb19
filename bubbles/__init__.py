"""bubbles — a PySpark-native hierarchical density-based clustering engine.

Brand-new DataFrame-first rebuild of the capabilities of the MR-HDBSCAN*
reference (SZU-AdvTech-2022/232; Santos et al., IEEE TBD 2021): an
MLlib-style ``MRHDBSCAN`` estimator plus a library of independently
testable operators (distances, Data-Bubble summarization, stratified
sampling, nearest-representative assignment, top-k/kNN, connected
components, dendrogram merge) and large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Blueprint: SURVEY.md. Reference is cited per-function as file:line of
/root/reference/源代码; no code is copied from it.
"""

__all__ = ["MRHDBSCAN", "MRHDBSCANModel", "approximate_predict"]


def __getattr__(name):  # lazy: keep numpy-only kernel imports Spark-free
    if name in ("MRHDBSCAN", "MRHDBSCANModel"):
        from bubbles.plans import mrhdbscan

        return getattr(mrhdbscan, name)
    if name == "approximate_predict":
        from bubbles.plans.predict import approximate_predict

        return approximate_predict
    raise AttributeError(name)
