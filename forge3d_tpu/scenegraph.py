# forge3d_tpu/scenegraph.py
# Hierarchical scene graph: named nodes with local TRS/matrix transforms,
# parent/child links, lazy world-matrix propagation and traversal.
#
# Parity notes (reference behavior, not code):
#   /root/reference/src/core/scene_graph/{core,traversal,types}.rs —
#   hierarchical transforms with dirty propagation and depth-first
#   traversal, used by glTF imports and instanced content.

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


@dataclass
class Node:
    name: str
    local: np.ndarray                       # (4,4) local transform
    parent: Optional["Node"] = None
    children: List["Node"] = field(default_factory=list)
    payload: object = None                  # mesh / light / camera / any
    _world: Optional[np.ndarray] = None     # cached world transform

    def mark_dirty(self) -> None:
        self._world = None
        for c in self.children:
            c.mark_dirty()

    @property
    def world(self) -> np.ndarray:
        if self._world is None:
            if self.parent is None:
                self._world = np.asarray(self.local, np.float64).copy()
            else:
                self._world = self.parent.world @ self.local
        return self._world

    def set_local(self, matrix: np.ndarray) -> None:
        m = np.asarray(matrix, np.float64)
        if m.shape != (4, 4):
            raise ValueError("local transform must be a 4x4 matrix")
        self.local = m
        self.mark_dirty()


class SceneGraph:
    """A rooted transform hierarchy with named lookup and DFS traversal."""

    def __init__(self):
        self.root = Node("root", np.eye(4))
        self._by_name: Dict[str, Node] = {"root": self.root}

    def add(self, name: str, *, parent: str = "root",
            local: Optional[np.ndarray] = None, payload=None) -> Node:
        if name in self._by_name:
            raise ValueError(f"node {name!r} already exists")
        pnode = self._by_name.get(parent)
        if pnode is None:
            raise KeyError(f"unknown parent node {parent!r}")
        node = Node(name, np.eye(4) if local is None
                    else np.asarray(local, np.float64),
                    parent=pnode, payload=payload)
        pnode.children.append(node)
        self._by_name[name] = node
        return node

    def __getitem__(self, name: str) -> Node:
        return self._by_name[name]

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def remove(self, name: str) -> None:
        if name == "root":
            raise ValueError("cannot remove the root node")
        node = self._by_name.pop(name)
        node.parent.children.remove(node)
        for child in list(self.walk(node)):
            self._by_name.pop(child.name, None)

    def reparent(self, name: str, new_parent: str) -> None:
        node = self._by_name[name]
        target = self._by_name[new_parent]
        # cycle guard: target may not be a descendant of node
        probe = target
        while probe is not None:
            if probe is node:
                raise ValueError("reparent would create a cycle")
            probe = probe.parent
        node.parent.children.remove(node)
        node.parent = target
        target.children.append(node)
        node.mark_dirty()

    def walk(self, start: Optional[Node] = None) -> Iterator[Node]:
        """Depth-first traversal (children in insertion order), excluding
        the start node itself."""
        stack = list(reversed((start or self.root).children))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.children))

    def flatten(self, kind: Optional[type] = None):
        """(node, world_matrix) pairs for every payload-bearing node,
        optionally filtered by payload type — the world-space instance
        list the render layers consume."""
        out = []
        for n in self.walk():
            if n.payload is None:
                continue
            if kind is not None and not isinstance(n.payload, kind):
                continue
            out.append((n, n.world))
        return out

    def transform_points(self, name: str, pts: np.ndarray) -> np.ndarray:
        """Apply a node's world transform to (N, 3) points."""
        m = self._by_name[name].world
        p = np.asarray(pts, np.float64).reshape(-1, 3)
        return (p @ m[:3, :3].T) + m[:3, 3]
