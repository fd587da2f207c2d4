"""Orbax checkpointing with top-k retention.

Replaces Lightning ModelCheckpoint(save_top_k=5, monitor=
val_custom_val_loss) + ckpt_path resume (Manager.py:56-61,106) and the
legacy per-epoch .t7 saves with filename-derived resume epochs
(DenoisingGCN/train.py:87-90,132; NetworkController.py:28-52 including
its overwrite protection).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, top_k: int = 5):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self._ckpt = ocp.StandardCheckpointer()
        self._scores_file = self.dir / "scores.json"
        self._scores: dict[str, float] = {}
        if self._scores_file.exists():
            self._scores = json.loads(self._scores_file.read_text())

    def _flush_scores(self):
        self._scores_file.write_text(json.dumps(self._scores, indent=1))

    def save(self, step: int, state: Any, score: float) -> None:
        """Keep the top-k lowest-score checkpoints (Manager.py:56-61).

        A same-step directory left over from a PREVIOUS run is replaced
        (a fresh run restarts step numbering; crashing mid-training on a
        stale dir helps no one). The reference-style overwrite
        protection (NetworkController.py:35-43) still applies to steps
        saved within this manager's lifetime via the scores registry.
        """
        name = f"step_{step}"
        path = self.dir / name
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self._scores[name] = float(score)
        self._flush_scores()
        # Evict beyond top_k.
        ranked = sorted(self._scores.items(), key=lambda kv: kv[1])
        for victim, _ in ranked[self.top_k :]:
            vpath = self.dir / victim
            if vpath.exists():
                import shutil

                shutil.rmtree(vpath)
            self._scores.pop(victim, None)
        self._flush_scores()

    def best_step(self) -> Optional[int]:
        if not self._scores:
            return None
        name = min(self._scores, key=self._scores.get)
        return int(name.split("_")[1])

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore a checkpoint (best by default) into the template's
        structure — the ckpt_path resume of Manager.py:91-107."""
        step = self.best_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        return self._ckpt.restore(self.dir / f"step_{step}", state_template)
