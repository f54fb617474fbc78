"""Checkpointing with best/last promotion AND resume.

The reference saves weights-only best/last .pth and can never resume
(SURVEY.md section 5 "Checkpoint / resume"). Here the full train state
(params + optimizer + step [+ EMA]) is saved via orbax; `finalize` copies
best (fallback last) into final_weights/ with a structural probe — the
contract of reference scripts/Modello_4.py:22-49.
"""

from __future__ import annotations

import json
import os
import shutil

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 model_config: dict | None = None):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()
        self._meta_path = os.path.join(self.dir, "meta.json")
        self.meta = {"best_step": None, "best_psnr": float("-inf"),
                     "last_step": None}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)
        # persist the model architecture next to the weights so inference
        # can rebuild the exact module from the checkpoint dir alone
        self._cfg_path = os.path.join(self.dir, "model_config.json")
        if model_config is not None:
            with open(self._cfg_path, "w") as f:
                json.dump(model_config, f, indent=2)

    def model_config(self) -> dict | None:
        if os.path.exists(self._cfg_path):
            with open(self._cfg_path) as f:
                return json.load(f)
        return None

    def _save_meta(self) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f, indent=2)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.dir, f"step_{step:010d}")

    def save(self, state, step: int, psnr: float | None = None,
             block: bool = True) -> bool:
        """Save `state`; track best by PSNR. Returns True if new best (the
        reference's best-PSNR checkpoint policy,
        scripts/Modello_supporto.py:174-185).

        With block=False the save is ASYNC: the device->host snapshot
        happens synchronously (safe with donated train-state buffers) and
        the disk write overlaps the next epoch — the Trainer's hot-loop
        mode. At most one save is in flight — a new save waits for the
        previous one. Orbax commits atomically (tmp dir + rename), so a
        crash mid-write leaves no partial step dir and `restore` falls
        back to the newest committed step."""
        self._ckptr.wait_until_finished()
        path = self._step_dir(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        if block:
            self._ckptr.wait_until_finished()
        self.meta["last_step"] = step
        is_best = False
        if psnr is not None and psnr > self.meta.get("best_psnr", float("-inf")):
            self.meta["best_psnr"] = psnr
            self.meta["best_step"] = step
            is_best = True
        self._save_meta()
        self._gc()
        return is_best

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self._ckptr.wait_until_finished()

    def _gc(self) -> None:
        steps = sorted(self.all_steps())
        protected = {self.meta.get("best_step"), self.meta.get("last_step")}
        removable = [s for s in steps if s not in protected]
        while len(removable) > max(0, self.keep - len(protected)):
            s = removable.pop(0)
            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def all_steps(self) -> list[int]:
        out = []
        for d in os.listdir(self.dir):
            # exact step_NNNN dirs only: orbax in-flight tmp dirs are named
            # step_NNNN.orbax-checkpoint-tmp-* and must not be counted
            if d.startswith("step_") and d[5:].isdigit():
                out.append(int(d[5:]))
        return sorted(out)

    def restore(self, target, step: int | None = None):
        """Restore into the structure of `target` (a concrete state pytree).
        step=None -> last committed (falls back past interrupted saves)."""
        self._ckptr.wait_until_finished()
        if step is None:
            committed = self.all_steps()
            last = self.meta.get("last_step")
            step = (last if last in committed
                    else (committed[-1] if committed else None))
        if step is None:
            return None
        path = self._step_dir(step)
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path, target=target)

    def restore_best(self, target):
        best = self.meta.get("best_step")
        if best is None:
            return self.restore(target)
        return self.restore(target, step=best)

    def finalize(self, out_dir: str, probe=None) -> str:
        """Promote best (fallback last) to `out_dir`/best, validating with
        `probe(state)` if given (reference scripts/Modello_4.py:22-49)."""
        self._ckptr.wait_until_finished()
        step = self.meta.get("best_step")
        if step is None:  # explicit: `or` would skip a best_step of 0
            step = self.meta.get("last_step")
        if step is None:
            raise FileNotFoundError("no checkpoints to finalize")
        src = self._step_dir(step)
        dst = os.path.join(out_dir, "best")
        os.makedirs(out_dir, exist_ok=True)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        if os.path.exists(self._cfg_path):
            shutil.copy(self._cfg_path,
                        os.path.join(out_dir, "model_config.json"))
        if probe is not None:
            probe(dst)
        return dst


def load_params_for_inference(ckpt_dir: str, prefer_ema: bool = True,
                              with_config: bool = False):
    """Load model params (EMA if present) from a CheckpointManager dir or a
    finalized `final_weights/best` directory, without needing the train
    state structure — the inference-side consumer of the checkpoint
    contract (reference scripts/Modello_5.py:58-65). With with_config=True,
    also returns the saved model-architecture dict (or None)."""
    import os

    # orbax rejects relative paths; accept them at every CLI/API surface
    ckpt_dir = os.path.abspath(ckpt_dir)
    path = ckpt_dir
    cfg = None
    cfg_path = os.path.join(ckpt_dir, "model_config.json")
    if os.path.exists(os.path.join(ckpt_dir, "meta.json")):
        mgr = CheckpointManager(ckpt_dir)
        step = mgr.meta.get("best_step")
        if step is None:  # explicit: `or` would skip a best_step of 0
            step = mgr.meta.get("last_step")
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        path = mgr._step_dir(step)
        cfg = mgr.model_config()
    elif os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    elif os.path.exists(os.path.join(os.path.dirname(ckpt_dir),
                                     "model_config.json")):
        with open(os.path.join(os.path.dirname(ckpt_dir),
                               "model_config.json")) as f:
            cfg = json.load(f)
    tree = ocp.StandardCheckpointer().restore(path)
    params = (tree["ema_params"]
              if prefer_ema and tree.get("ema_params") is not None
              else tree["params"])
    return (params, cfg) if with_config else params


def params_probe(expected_key_path: str):
    """Returns a probe asserting a parameter path exists in a finalized
    checkpoint (the analog of the reference's 'stage1.conv_first.weight'
    state-dict check)."""

    def _probe(path: str) -> None:
        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(path)
        node = tree
        for part in expected_key_path.split("/"):
            if part not in node:
                raise KeyError(
                    f"finalized checkpoint missing {expected_key_path!r}")
            node = node[part]

    return _probe
