"""FragState: the genome state as an immutable struct-of-arrays pytree.

Field semantics (mirroring the reference `frag` struct,
kernel_sparse_adapt.cu:40-58):

  pos        position of the fragment within its contig (0-based)
  sub_pos    position in sub-fragment (level-1) units
  id_c       contig id
  start_bp   bp offset of the fragment start within its contig
  len_bp     fragment length in bp
  sub_len    number of level-1 sub-fragments under this fragment
  circ       1 if the contig is circular
  id         fragment id (= array index)
  prev/next  fragment ids of the neighbours in the contig (-1 at ends)
  l_cont     number of fragments in the contig
  sub_l_cont number of sub-fragments in the contig
  l_cont_bp  contig length in bp
  ori        orientation (+1 watson / -1 crick)
  rep        1 if this is a duplicated (repeat) fragment
  activ      1 if the fragment is active
  id_d       id of the original fragment this one duplicates
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FragState(NamedTuple):
    pos: jnp.ndarray
    sub_pos: jnp.ndarray
    id_c: jnp.ndarray
    start_bp: jnp.ndarray
    len_bp: jnp.ndarray
    sub_len: jnp.ndarray
    circ: jnp.ndarray
    id: jnp.ndarray
    prev: jnp.ndarray
    next: jnp.ndarray
    l_cont: jnp.ndarray
    sub_l_cont: jnp.ndarray
    l_cont_bp: jnp.ndarray
    ori: jnp.ndarray
    rep: jnp.ndarray
    activ: jnp.ndarray
    id_d: jnp.ndarray

    @property
    def n_frags(self) -> int:
        return self.pos.shape[0]

    def replace(self, **kw) -> "FragState":
        return self._replace(**kw)

    def where(self, mask, **updates) -> "FragState":
        """Masked update: fields take `updates` where mask else current."""
        new = {}
        for name, val in updates.items():
            cur = getattr(self, name)
            new[name] = jnp.where(mask, val, cur)
        return self._replace(**new)


def state_from_soa(soa: dict, ori: np.ndarray | None = None) -> FragState:
    """Build a FragState from a pyramid-level SoA dict (+repeat fields).

    The SoA dict comes either from Level.S_o_A_frags (14 fields) or from
    the simulation's repeat-extended dict (17 fields).
    """
    n = len(soa["pos"])

    # bp bookkeeping (start_bp, l_cont_bp) is int32; after scaffolding
    # every fragment can end up in ONE contig, so the whole assembly
    # length must fit — the same 2^31 limit as the reference's int32
    # `frag` struct (kernel_sparse_adapt.cu:40-58). Guard here rather
    # than overflow silently during paste_contigs.
    total_bp = int(np.asarray(soa["len_bp"], dtype=np.int64).sum())
    if total_bp >= 2**31:
        raise OverflowError(
            f"assembly is {total_bp} bp >= 2^31; int32 bp bookkeeping "
            "would overflow when contigs merge. Scaffold such genomes "
            "at a coarser pyramid level per chromosome subset, or "
            "rescale units."
        )

    def get(name, default=None):
        if name in soa:
            return jnp.asarray(np.asarray(soa[name], dtype=np.int32))
        return jnp.asarray(np.full(n, default, dtype=np.int32))

    return FragState(
        pos=get("pos"),
        sub_pos=get("sub_pos"),
        id_c=get("id_c"),
        start_bp=get("start_bp"),
        len_bp=get("len_bp"),
        sub_len=get("sub_len"),
        circ=get("circ"),
        id=jnp.arange(n, dtype=jnp.int32),
        prev=get("prev"),
        next=get("next"),
        l_cont=get("l_cont"),
        sub_l_cont=get("sub_l_cont"),
        l_cont_bp=get("l_cont_bp"),
        ori=(
            jnp.asarray(np.asarray(ori, dtype=np.int32))
            if ori is not None
            else get("ori", 1)
        ),
        rep=get("rep", 0),
        activ=get("activ", 1),
        id_d=(
            get("id_d")
            if "id_d" in soa
            else jnp.arange(n, dtype=jnp.int32)
        ),
    )


def state_to_numpy(state: FragState) -> dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in state._asdict().items()}


def check_invariants(state: FragState) -> list[str]:
    """Host-side sanity checks, mirroring the reference's debug asserts
    (reference cuda_lib_gl_single.py:2500-2515). Returns violations.
    """
    s = state_to_numpy(state)
    bad = []
    if (s["pos"] < 0).any():
        bad.append("pos < 0")
    if (s["l_cont"] <= 0).any():
        bad.append("l_cont <= 0")
    if (s["l_cont_bp"] <= 0).any():
        bad.append("l_cont_bp <= 0")
    if (s["start_bp"] < 0).any():
        bad.append("start_bp < 0")
    if ((s["l_cont_bp"] - s["start_bp"]) <= 0).any():
        bad.append("start_bp beyond contig")
    if ((s["start_bp"] != 0) & (s["pos"] == 0)).any():
        bad.append("pos 0 with nonzero start_bp")
    if ((s["start_bp"] == 0) & (s["pos"] != 0)).any():
        bad.append("nonzero pos with start_bp 0")
    if (s["next"] == s["id"]).any():
        bad.append("self next")
    if (s["prev"] == s["id"]).any():
        bad.append("self prev")
    # structural: pos unique per contig, l_cont consistent
    import numpy as _np

    for cid in _np.unique(s["id_c"]):
        m = s["id_c"] == cid
        n = int(m.sum())
        if sorted(s["pos"][m].tolist()) != list(range(n)):
            bad.append(f"contig {cid}: positions not 0..{n - 1}")
        if not (s["l_cont"][m] == n).all():
            bad.append(f"contig {cid}: l_cont mismatch")
    return bad
