"""Checkpoint system: pytree snapshots + trigger-policy strategies.

Reproduces the reference's checkpoint contract
(resnet/utils/checkpoint_util.py) on JAX pytrees:

- file scheme ``{kind}_{steps}.ckpt`` in a flat checkpoint dir
  (checkpoint_util.py:16-27);
- newest-5-per-kind retention GC (checkpoint_util.py:44-49);
- latest-step discovery + resume-by-default (checkpoint_util.py:30-41,52-71);
- multi-kind load asserting all kinds restored to the same step
  (checkpoint_util.py:88-115);
- trigger-policy objects (Frequency/Performance) whose own counters are
  checkpointed state (checkpoint_util.py:140-204).

Storage format: a single ``.npz`` per (kind, step) holding the flattened
pytree with '/'-joined path keys — the JAX analog of a torch ``state_dict``
.pth. Writes are atomic (tmp file + ``os.replace``), an upgrade over the
reference (SURVEY.md §5.2 recommends an atomic-rename protocol).

Anything with ``state_dict()/load_state_dict()`` is checkpointable —
schedulers (optim.py), strategies (below), fitted transforms (data/), and
``PytreeCheckpointable`` wraps a raw pytree (the train state).
"""

from __future__ import annotations

import abc
import json
import math
import os
import re
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

CKPT_SUFFIX = "ckpt"

# Reserved kind: one manifest_{steps}.json per multi-kind save, written
# LAST, certifies that every kind's file for that step was durably renamed
# into place — the kind-set becomes atomic as a unit (ROADMAP r2 #7;
# upgrade over reference checkpoint_util.py:112-114, whose per-kind loads
# can observe a torn save).
MANIFEST_KIND = "manifest"
MANIFEST_SUFFIX = "json"

_NAME_RE = re.compile(r"(\w+)_([0-9]+)\.([a-z]+)$")


def _format_name(kind: str, steps: int, suffix: str = CKPT_SUFFIX) -> str:
    return f"{kind}_{steps}.{suffix}"


def _parse_name(filename: str) -> Optional[Dict[str, Any]]:
    m = _NAME_RE.match(filename)
    if m is None:
        return None
    return {"kind": m.group(1), "steps": int(m.group(2)), "suffix": m.group(3)}


def _latest_n_checkpoint_steps(base_path: str, n: int = 5, kind: str = ""):
    if not os.path.isdir(base_path):
        return []
    steps = set()
    for f in os.listdir(base_path):
        parsed = _parse_name(f)
        # exact kind match ('' = any kind): prefix matching would conflate
        # e.g. a future 'classifier_ema' kind with 'classifier'
        if parsed and (not kind or parsed["kind"] == kind):
            steps.add(parsed["steps"])
    return sorted(steps)[-n:]


def _latest_step(base_path: str, kind: str = "") -> Optional[int]:
    latest = _latest_n_checkpoint_steps(base_path, n=1, kind=kind)
    return latest[-1] if latest else None


def _clean(base_path: str, kind: str, n: int = 5) -> None:
    keep = set(_latest_n_checkpoint_steps(base_path, n=n, kind=kind))
    for fname in os.listdir(base_path):
        parsed = _parse_name(fname)
        if parsed and parsed["kind"] == kind and parsed["steps"] not in keep:
            try:
                os.remove(os.path.join(base_path, fname))
            except FileNotFoundError:  # another process GC'd it first
                pass


# --- pytree <-> flat dict --------------------------------------------------


def _flatten_state(state: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    for path, leaf in leaves:
        key = prefix + "/".join(_path_key(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_key(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    return str(entry)


def _restore_like(template, flat: Dict[str, np.ndarray]):
    """Rebuild a pytree with the template's structure from flat path keys,
    asserting shape/dtype agreement (torch load_state_dict discipline)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        key = "/".join(_path_key(p) for p in path)
        if key not in flat:
            raise KeyError(f"Checkpoint is missing key {key!r}.")
        stored = flat[key]
        leaf_arr = np.asarray(leaf)
        if tuple(stored.shape) != tuple(leaf_arr.shape):
            raise ValueError(
                f"Checkpoint key {key!r} has shape {stored.shape}, "
                f"expected {leaf_arr.shape}.")
        new_leaves.append(stored.astype(leaf_arr.dtype))
    extra = set(flat) - {
        "/".join(_path_key(p) for p in path) for path, _ in paths_and_leaves
    }
    if extra:
        raise KeyError(f"Checkpoint has unexpected keys: {sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class PytreeCheckpointable:
    """state_dict protocol over a raw pytree (e.g. the train state). The
    wrapped tree is replaced wholesale on load; read it back via ``.tree``."""

    def __init__(self, tree):
        self.tree = tree

    def state_dict(self):
        return self.tree

    def load_state_dict(self, d):
        self.tree = d


# --- save / load -----------------------------------------------------------


def save_checkpoint(
    checkpoint_dir: str,
    kind_name: str,
    checkpointable,
    steps: int,
    keep: int = 5,
) -> str:
    """Atomic save + retention GC (reference: checkpoint_util.py:74-85)."""
    if kind_name == MANIFEST_KIND:
        raise ValueError(
            f"kind name {MANIFEST_KIND!r} is reserved for save manifests.")
    os.makedirs(checkpoint_dir, exist_ok=True)
    state = checkpointable.state_dict()
    flat = _flatten_state(state)
    path = os.path.join(checkpoint_dir, _format_name(kind_name, steps))
    # pid-unique tmp name: concurrent writers (multi-host fitted-transform
    # saves on a shared filesystem) never interleave into the same tmp file
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    _clean(checkpoint_dir, kind_name, n=keep)
    return path


def maybe_load_checkpoint(
    checkpoint_dir: str,
    kind_name: str,
    checkpointable,
    steps: Optional[int] = None,
    verbose: bool = True,
) -> int:
    """Load latest (or given-step) checkpoint into the checkpointable;
    return its step, or 0 when none exists (run-from-scratch contract,
    reference: checkpoint_util.py:52-71)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    steps_ = _latest_step(checkpoint_dir, kind_name) if steps is None else steps
    path = (os.path.join(checkpoint_dir, _format_name(kind_name, steps_))
            if steps_ is not None else None)
    if path is None or not os.path.exists(path):
        if verbose:
            print(f"No {kind_name} checkpoint at {checkpoint_dir} "
                  f"with step {steps}. Running from scratch.")
        return 0
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    template = checkpointable.state_dict()
    checkpointable.load_state_dict(_restore_like(template, flat))
    if verbose:
        print(f"Loaded {kind_name} checkpoint from {checkpoint_dir}, "
              f"with step {steps_}. Continuing from checkpoint.")
    return steps_


def _manifest_resume_step(checkpoint_dir: str, kinds: List[str],
                          exclude: Optional[set] = None) -> Optional[int]:
    """Newest manifested step covering every requested kind whose files all
    still exist — and, when the manifest records file sizes, still have
    exactly those sizes (a truncated-but-present kind file scans back to
    the previous complete save instead of failing np.load at resume).
    ``exclude`` skips steps whose files proved unreadable despite passing
    the size check (same-size corruption; the caller scans back). None
    when no manifest qualifies (pre-manifest dirs, or a changed kind
    set — the common-step fallback handles those)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    for step, manifest_kinds, sizes in _read_manifests(checkpoint_dir):
        if exclude and step in exclude:
            continue
        if not set(kinds) <= set(manifest_kinds):
            continue

        def intact(kind):
            path = os.path.join(checkpoint_dir, _format_name(kind, step))
            if not os.path.exists(path):
                return False
            want = sizes.get(kind)
            return want is None or os.path.getsize(path) == want

        if all(intact(k) for k in kinds):
            return step
    return None


def maybe_load_checkpoints(
    checkpoint_dir: str,
    checkpointables: Dict[str, Any],
    steps: Optional[int] = None,
    verbose: bool = True,
) -> int:
    """Multi-kind load; all kinds restore to the same step
    (reference: checkpoint_util.py:88-115).

    When ``steps`` is None, the target is the newest step whose manifest
    (written last by ``save_checkpoints``, so the whole kind set is known
    durable) covers every requested kind and whose files exist. Dirs
    without manifests (older saves) fall back to the newest step at which
    EVERY kind has a file — not each kind's own latest: a crash between
    the per-kind writes of one save (a normal window with the async
    writer) leaves kinds at different latest steps, and loading the
    newest *common* step resumes from the last complete save instead of
    failing the reference's aligned-step assertion. Kinds sharing no
    common step (a genuinely corrupted dir) still raise."""
    kinds = [k for k, c in checkpointables.items() if c is not None]
    if not kinds:
        return 0
    if steps is None:
        # Manifested resume with scan-back on unreadable files: the size
        # check in _manifest_resume_step catches truncation, but a
        # same-size-corrupted kind file only surfaces when np.load parses
        # it — retry the next older complete manifest instead of failing
        # the run (ROADMAP durability polish).
        tried: set = set()
        while True:
            cand = _manifest_resume_step(checkpoint_dir, kinds,
                                         exclude=tried)
            if cand is None:
                break
            try:
                return _load_all_kinds(checkpoint_dir, checkpointables,
                                       kinds, cand, verbose)
            except (OSError, ValueError, KeyError, zipfile.BadZipFile) as e:
                tried.add(cand)
                if verbose:
                    print(f"Checkpoint step {cand} unreadable despite "
                          f"matching its manifest ({type(e).__name__}: "
                          f"{e}); scanning back to an older save.")
    if steps is None:
        per_kind = {
            k: set(_latest_n_checkpoint_steps(
                checkpoint_dir, n=1_000_000, kind=k))
            for k in kinds
        }
        empty = [k for k, v in per_kind.items() if not v]
        if len(empty) == len(kinds):
            steps_ = None  # nothing saved yet: run from scratch
        elif empty:
            # A kind with zero files means no complete save ever finished
            # (reachable in normal operation: a crash during the very first
            # async save, after some kinds' files but before the rest).
            # Same outcome as nothing-saved-yet: run from scratch. Name the
            # empty kinds so a genuinely corrupted dir is diagnosable.
            if verbose:
                print(f"Checkpoint kind(s) {empty} have no files at "
                      f"{checkpoint_dir} (crash during the first save, or "
                      f"a corrupted dir). Running from scratch.")
            return 0
        else:
            common = set.intersection(*per_kind.values())
            if not common:
                raise RuntimeError(
                    f"Checkpoint kinds share no common step: "
                    f"{ {k: sorted(v)[-3:] for k, v in per_kind.items()} }")
            steps_ = max(common)
    else:
        steps_ = steps
    return _load_all_kinds(checkpoint_dir, checkpointables, kinds, steps_,
                           verbose)


def _load_all_kinds(checkpoint_dir, checkpointables, kinds, steps_,
                    verbose) -> int:
    global_steps = [
        maybe_load_checkpoint(checkpoint_dir, k, checkpointables[k],
                              steps_, verbose)
        for k in kinds
    ]
    if len(set(global_steps)) != 1:
        raise RuntimeError(
            f"Checkpoint steps not aligned: "
            f"{dict(zip(kinds, global_steps))}")
    return global_steps[0]


def _write_manifest(checkpoint_dir: str, steps: int, kinds: List[str],
                    keep: int = 5) -> None:
    # record each kind file's byte size so resume can detect a
    # truncated-but-present file and scan back (sizes are free: the kind
    # files were just written by this process)
    sizes = {}
    for k in kinds:
        try:
            sizes[k] = os.path.getsize(
                os.path.join(checkpoint_dir, _format_name(k, steps)))
        except OSError:
            pass
    path = os.path.join(
        checkpoint_dir, _format_name(MANIFEST_KIND, steps, MANIFEST_SUFFIX))
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump({"steps": int(steps), "kinds": sorted(kinds),
                   "sizes": sizes}, f)
    os.replace(tmp, path)
    _clean(checkpoint_dir, MANIFEST_KIND, n=keep)


def _read_manifests(
        checkpoint_dir: str) -> List[Tuple[int, List[str], Dict[str, int]]]:
    """(steps, kinds, sizes) per manifest, newest first; unreadable ones
    skipped. ``sizes`` is empty for manifests written before sizes were
    recorded (they then verify by existence only)."""
    out = []
    for step in reversed(_latest_n_checkpoint_steps(
            checkpoint_dir, n=1_000_000, kind=MANIFEST_KIND)):
        path = os.path.join(
            checkpoint_dir, _format_name(MANIFEST_KIND, step, MANIFEST_SUFFIX))
        try:
            with open(path) as f:
                data = json.load(f)
            out.append((step, list(data["kinds"]),
                        dict(data.get("sizes", {}))))
        except (OSError, ValueError, KeyError):
            continue  # torn/corrupted manifest: ignore, older ones cover
    return out


def save_checkpoints(
    checkpoint_dir: str,
    checkpointables: Dict[str, Any],
    steps: int,
    keep: int = 5,
) -> None:
    kinds = [k for k, c in checkpointables.items() if c is not None]
    for kind_name in kinds:
        save_checkpoint(checkpoint_dir, kind_name, checkpointables[kind_name],
                        steps, keep=keep)
    # written LAST: the manifest's existence certifies the whole kind set
    # landed for this step (a crash before this line leaves no manifest and
    # resume falls back to the previous manifested/complete save)
    _write_manifest(checkpoint_dir, steps, kinds, keep=keep)


class AsyncCheckpointer:
    """Background checkpoint writer (SURVEY §5.4's 'Orbax-style async
    checkpointing' disposition): the training loop snapshots state
    synchronously — cheap, because ``state_dict()`` builds a fresh
    container whose leaves are immutable (jax arrays, Python scalars) or
    never mutated after fit (numpy statistics) — and the serialization,
    device->host copies, atomic rename, and retention GC all run on one
    worker thread, so a 0.4 GB WRN checkpoint no longer stalls the step
    loop.

    Semantics:
    - saves land in submission order (single worker, FIFO queue);
    - the queue is bounded (depth 2): if writes can't keep up with the
      trigger cadence, ``submit`` degrades gracefully to blocking;
    - device-memory bound: AT MOST ONE extra device-side copy of the train
      state is live at any time. The worker device_gets a submitted
      snapshot FIRST and signals release before the slow serialize/write;
      ``wait_prior_release()`` (called by the save path before jitting the
      next snapshot) blocks until that signal, so snapshot N+1's device
      buffers are only allocated after snapshot N's were dropped;
    - ``wait()`` blocks until everything submitted is durable on disk and
      re-raises the first writer error (also re-raised by a later
      ``submit``). Call it before reading 'latest' checkpoints and at
      training exit.
    """

    def __init__(self):
        import queue as _queue
        import threading

        self._q: "_queue.Queue" = _queue.Queue(maxsize=2)
        self._error: Optional[BaseException] = None
        self._release: Optional["threading.Event"] = None
        self._threading = threading
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                checkpoint_dir, snap, steps, keep, release = item
                try:
                    # D2H first, then drop the device refs and signal: the
                    # device-side snapshot's lifetime is the copy, not the
                    # (much slower) npz serialization + fsync behind it
                    host_snap = jax.device_get(snap)
                finally:
                    snap = None
                    item = None
                    release.set()
                save_checkpoints(
                    checkpoint_dir,
                    {k: PytreeCheckpointable(v)
                     for k, v in host_snap.items()},
                    steps, keep=keep)
            except BaseException as e:  # noqa: BLE001 — surfaced on wait()
                if self._error is None:
                    self._error = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def wait_prior_release(self) -> None:
        """Block until the previously-submitted snapshot's device buffers
        were dropped (its D2H copy finished) — the one-extra-copy HBM cap."""
        if self._release is not None:
            self._release.wait()

    def submit(self, checkpoint_dir: str, checkpointables: Dict[str, Any],
               steps: int, keep: int = 5) -> None:
        """Snapshot now, write in the background."""
        self._raise_pending()
        snap = {
            kind: c.state_dict()
            for kind, c in checkpointables.items() if c is not None
        }
        release = self._threading.Event()
        self._q.put((checkpoint_dir, snap, steps, keep, release))
        self._release = release

    def wait(self) -> None:
        """Block until all submitted saves are durable; re-raise errors."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join(timeout=10)


# --- trigger-policy strategies --------------------------------------------


class CheckpointStrategy(abc.ABC):
    """Stateful trigger policy; counters are checkpointed state so resume
    continues the cadence (reference: checkpoint_util.py:140-172). The
    strategy's ``epoch_step`` doubles as the training loop's epoch counter
    (training.py:87-88)."""

    # Subclasses whose observe() consumes the fresh loss set this True; the
    # training loop reads it to decide on a synchronous per-step loss fetch
    # (same protocol as LRScheduler.requires_loss — dispatch on capability,
    # not on type(x).__name__, so subclasses inherit the right behavior).
    requires_loss = False

    def __init__(self, unit: str):
        if unit not in ("batch", "epoch"):
            raise ValueError("unit must be 'batch' or 'epoch'.")
        self._unit = unit
        self._batch_step = 0
        self._epoch_step = 0

    @property
    def unit(self) -> str:
        return self._unit

    @property
    def batch_step(self) -> int:
        return self._batch_step

    @property
    def epoch_step(self) -> int:
        return self._epoch_step

    def step(self, unit: str) -> None:
        if unit == "batch":
            self._batch_step += 1
        elif unit == "epoch":
            self._epoch_step += 1
        else:
            raise ValueError("unit must be 'batch' or 'epoch'.")

    @abc.abstractmethod
    def observe(self, unit: str, **kwargs) -> bool:
        """Observe, update counters, return checkpoint eligibility."""

    def state_dict(self) -> Dict[str, Any]:
        return {"batch_step": self._batch_step, "epoch_step": self._epoch_step}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self._batch_step = int(d["batch_step"])
        self._epoch_step = int(d["epoch_step"])


class FrequencyCheckpointStrategy(CheckpointStrategy):
    """Fire every N of the configured unit. Reproduces the reference's
    pre-increment modulo check (checkpoint_util.py:175-185): eligibility is
    evaluated on the counter *before* it advances."""

    def __init__(self, unit: str, frequency: int, **_ignored):
        super().__init__(unit)
        self._frequency = int(frequency)

    def observe(self, unit: str, **kwargs) -> bool:
        cond = getattr(self, f"{unit}_step") % self._frequency == 0
        self.step(unit)
        return cond if self.unit == unit else False


class PerformanceCheckpointStrategy(CheckpointStrategy):
    """Fire on a new lowest loss (checkpoint_util.py:188-204)."""

    requires_loss = True

    def __init__(self, unit: str, **_ignored):
        super().__init__(unit)
        self._lowest_loss = math.inf

    @property
    def lowest_loss(self) -> float:
        return self._lowest_loss

    def observe(self, unit: str, loss: Optional[float] = None, **kwargs) -> bool:
        if self.unit != unit:
            # Off-unit observations only advance the counter (reference
            # 197-204 reads the loss but cannot fire or update best); a None
            # loss is allowed here so the training loop can stay async.
            self.step(unit)
            return False
        if loss is None:
            raise ValueError("PerformanceCheckpointStrategy requires the loss.")
        cond = loss < self._lowest_loss
        self.step(unit)
        if cond:
            self._lowest_loss = float(loss)
        return cond

    def state_dict(self):
        d = super().state_dict()
        d["lowest_loss"] = self._lowest_loss
        return d

    def load_state_dict(self, d):
        super().load_state_dict(d)
        self._lowest_loss = float(d["lowest_loss"])


_STRATEGIES = {
    "FrequencyCheckpointStrategy": FrequencyCheckpointStrategy,
    "PerformanceCheckpointStrategy": PerformanceCheckpointStrategy,
}


def get_checkpoint_strategy(
    checkpoint_strategy_cls_name: str,
    checkpoint_strategy_args: Optional[Dict[str, Any]] = None,
    **_ignored,
) -> CheckpointStrategy:
    """Name+kwargs factory (reference: checkpoint_util.py:207-220)."""
    if checkpoint_strategy_cls_name not in _STRATEGIES:
        raise ValueError(
            f"Unknown checkpoint strategy {checkpoint_strategy_cls_name!r}; "
            f"available: {sorted(_STRATEGIES)}")
    return _STRATEGIES[checkpoint_strategy_cls_name](
        **(checkpoint_strategy_args or {}))
