"""AssetManager: mutable scene registry with per-frame commit policy.

Counterpart of the reference's AssetManager lifecycle
(Resources/AssetManager.cs): meshes register/deregister through queues
(AddQueue/RemoveQueue/UpdateQueue, AssetManager.cs:430-520), BLAS builds
run once per source and are cached (per-ParentObject BuildTotal,
AssetManager.cs:978), and every frame `UpdateTLAS` decides the cheapest
refresh (AssetManager.cs:1610-1845): transform-only changes rebuild just
the (tiny) TLAS; geometry edits rebuild only the touched BLAS; add/remove
triggers a full re-aggregation with all untouched BLAS builds reused.

TPU design: the registry is host-side (geometry builds are host/native
anyway); `commit()` returns an immutable `Scene` pytree whose STRUCTURE is
stable across transform-only frames, so a jitted frame step keyed on the
scene treedef never retraces for animation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from truetrace_tpu.scene.instances import (
    SourceBuild, build_source, compile_scene_instanced,
    update_instance_transforms)
from truetrace_tpu.scene.mesh import HostMaterial, HostMesh


@dataclass
class _Source:
    mesh: HostMesh
    build: Optional[SourceBuild] = None   # cached BLAS (None = dirty)


@dataclass
class _Instance:
    source: int                 # source handle
    l2w: np.ndarray             # 4x4 row-vector local->world


@dataclass
class AssetManager:
    """Mutable scene front-end. Mutators only enqueue; `commit()` applies
    everything and returns the render-ready Scene (reference: mutations
    queue during the frame, MainThreadIfy/UpdateTLAS applies them,
    AssetManager.cs:430-520 + 1610-1845)."""
    materials: List[HostMaterial]
    env: object = None
    lights: object = None
    atlas: object = None
    atlas_rects: object = None
    atlas_level_y: object = None
    with_light_bvh: bool = False

    _sources: Dict[int, _Source] = field(default_factory=dict)
    _instances: Dict[int, _Instance] = field(default_factory=dict)
    _next_src: int = 0
    _next_inst: int = 0
    # dirty tracking (the commit policy's inputs)
    _topology_dirty: bool = True      # add/remove/geometry => full rebuild
    _transforms_dirty: bool = False   # moved instances => TLAS-only
    _materials_dirty: bool = False    # table refresh (no geometry rebuild)
    # last committed state
    _scene: object = None
    _isc: object = None
    _order: List[int] = field(default_factory=list)   # instance handles
    _src_order: List[int] = field(default_factory=list)

    # ---- mutation queues -------------------------------------------------
    def add_mesh(self, mesh: HostMesh) -> int:
        """Register a source geometry; returns its handle
        (reference AddQueue, AssetManager.cs:430)."""
        h = self._next_src
        self._next_src += 1
        self._sources[h] = _Source(mesh=mesh)
        self._topology_dirty = True
        return h

    def remove_mesh(self, handle: int) -> None:
        """Deregister a source and all its instances (RemoveQueue,
        AssetManager.cs:470)."""
        del self._sources[handle]
        self._instances = {k: v for k, v in self._instances.items()
                           if v.source != handle}
        self._topology_dirty = True

    def update_mesh(self, handle: int, mesh: HostMesh) -> None:
        """Replace a source's geometry: invalidates only ITS cached BLAS
        (UpdateQueue / ParentObject re-build, AssetManager.cs:500)."""
        self._sources[handle] = _Source(mesh=mesh, build=None)
        self._topology_dirty = True

    def add_instance(self, source: int, l2w: np.ndarray) -> int:
        if source not in self._sources:
            raise KeyError(f"unknown source {source}")
        h = self._next_inst
        self._next_inst += 1
        self._instances[h] = _Instance(source=source,
                                       l2w=np.asarray(l2w, np.float32))
        self._topology_dirty = True
        return h

    def remove_instance(self, handle: int) -> None:
        del self._instances[handle]
        self._topology_dirty = True

    def set_transform(self, handle: int, l2w: np.ndarray) -> None:
        """Move an instance — the cheap per-frame path (reference
        per-frame TLAS refresh for moved MeshData, AssetManager.cs:1714)."""
        self._instances[handle].l2w = np.asarray(l2w, np.float32)
        self._transforms_dirty = True

    def set_material(self, index: int, mat: HostMaterial) -> None:
        """Edit a global material slot. Emission edits change the light
        list topology -> full rebuild; everything else is a table swap
        (reference material update queue, AssetManager.cs:520)."""
        old = self.materials[index]
        if tuple(np.ravel(old.emission)) != tuple(np.ravel(mat.emission)):
            self._topology_dirty = True
        self.materials[index] = mat
        self._materials_dirty = True

    # ---- per-frame commit --------------------------------------------------
    def commit(self):
        """Apply queued mutations with the cheapest sufficient rebuild and
        return the Scene (reference UpdateTLAS policy,
        AssetManager.cs:1610-1845). Policy:
          topology dirty   -> re-aggregate (cached BLAS builds reused;
                              only dirty sources re-run build_source)
          transforms dirty -> host TLAS rebuild + light-row refresh only
          materials dirty  -> material table swap
          clean            -> cached Scene."""
        if self._topology_dirty:
            self._rebuild()
        elif self._transforms_dirty:
            try:
                self._scene, self._isc = update_instance_transforms(
                    self._scene, self._isc, self.materials,
                    self._pairs())
            except AssertionError:
                # moved AABBs collapsed to a different TLAS node count —
                # pytree structure would change; full re-aggregation
                # (BLAS builds still cached)
                self._rebuild()
        if self._materials_dirty and not self._topology_dirty:
            from truetrace_tpu.scene.mesh import (material_table,
                                                  shadow_tint_table)
            self._scene = self._scene.replace(
                materials=material_table(self.materials),
                tri_shadow=shadow_tint_table(
                    self.materials, np.asarray(self._scene.tri_mat)))
        self._topology_dirty = False
        self._transforms_dirty = False
        self._materials_dirty = False
        return self._scene

    @property
    def instanced(self):
        """The committed InstancedScene handle (traversal metadata)."""
        return self._isc

    def _pairs(self) -> List[Tuple[int, np.ndarray]]:
        """(contiguous source idx, l2w) pairs in the committed order."""
        remap = {h: i for i, h in enumerate(self._src_order)}
        return [(remap[self._instances[h].source], self._instances[h].l2w)
                for h in self._order]

    def _rebuild(self) -> None:
        if not self._instances:
            raise ValueError("commit() with no instances")
        self._src_order = sorted(self._sources)
        self._order = sorted(self._instances)
        # data-driven fat-leaf selection for the whole committed set (the
        # unified BLAS table is shared, so every source must agree);
        # cached builds with a different row width are rebuilt
        from truetrace_tpu.scene.instances import _auto_leaf_k
        meshes = [self._sources[h].mesh for h in self._src_order]
        k = _auto_leaf_k(meshes)
        prebuilt = []
        for h in self._src_order:
            s = self._sources[h]
            if s.build is None or s.build.rows.shape[1] != 10 * k:
                s.build = build_source(s.mesh, leaf_k=k)  # cached
            prebuilt.append(s.build)
        self._scene, self._isc = compile_scene_instanced(
            meshes, self.materials, self._pairs(),
            env=self.env, lights=self.lights, atlas=self.atlas,
            atlas_rects=self.atlas_rects, atlas_level_y=self.atlas_level_y,
            with_light_bvh=self.with_light_bvh, prebuilt=prebuilt,
            leaf_k=k)
