"""ogb.graphproppred surface the reference train scripts use: the Evaluator
(exact OGB metric semantics via sklearn, which is what the real ogb package
calls) and an import-only dataset stub (the parity runner supplies its own
Data lists from the committed synthetic generator)."""

import numpy as np


class PygGraphPropPredDataset:
    def __init__(self, *a, **k):
        raise RuntimeError(
            "PygGraphPropPredDataset is an import-only shim: OGB datasets "
            "are not available in this environment")


class Evaluator:
    """Exact ogb.graphproppred.Evaluator semantics for the metrics the
    reference uses: rocauc (molhiv), ap (molpcba), acc (ppa).  Per-task
    sklearn score over the non-NaN rows, averaged over tasks that have both
    classes present (ogb/graphproppred/evaluate.py)."""

    _METRIC = {"ogbg-molhiv": "rocauc", "ogbg-molpcba": "ap",
               "ogbg-ppa": "acc"}

    def __init__(self, name):
        self.name = name
        self.eval_metric = self._METRIC[name]

    def eval(self, input_dict):
        y_true = np.asarray(self._np(input_dict["y_true"]), np.float64)
        y_pred = np.asarray(self._np(input_dict["y_pred"]), np.float64)
        if y_true.ndim == 1:
            y_true = y_true[:, None]
        if y_pred.ndim == 1:
            y_pred = y_pred[:, None]
        if self.eval_metric == "acc":
            correct = (y_true[:, 0] == y_pred[:, 0]).mean()
            return {"acc": float(correct)}
        from sklearn.metrics import average_precision_score, roc_auc_score
        fn = roc_auc_score if self.eval_metric == "rocauc" else \
            average_precision_score
        scores = []
        for t in range(y_true.shape[1]):
            col = y_true[:, t]
            valid = ~np.isnan(col)
            if valid.any() and (col[valid] == 1).any() and \
                    (col[valid] == 0).any():
                scores.append(fn(col[valid], y_pred[valid, t]))
        if not scores:
            raise RuntimeError("no valid task for metric computation")
        return {self.eval_metric: float(np.mean(scores))}

    @staticmethod
    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else x
