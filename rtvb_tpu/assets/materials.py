"""Material system: registry → device-resident SoA parameter table.

Capability parity with renderer/assets/MaterialManager.{h,cpp} (GPU
MaterialParameter[] with albedo/roughness/metallic/translucency/emissive/
texture handles/uvScale, SystemParameter.h:11-38; dynamic create/update
slots; per-block index lookup) and the materials.yaml side of AssetRegistry.

The table is a pytree of (N,) arrays gathered per shading point; block id →
material index is a second small table, so the hot path does two cheap
gathers.  Textures are procedural ids (see assets/textures.py) — TPU-native
replacement for the reference's mipmapped CUDA texture objects.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
import yaml

from .blocks import BlockRegistry


@dataclass
class MaterialDef:
    name: str
    albedo: tuple = (0.8, 0.8, 0.8)
    roughness: float = 0.8
    metallic: float = 0.0
    translucency: float = 0.0
    emissive: tuple = (0.0, 0.0, 0.0)
    texture: str | None = None     # procedural texture name
    image: str | None = None       # authored image texture (data/textures/<name>.png)
    uv_scale: float = 1.0


_BUILTIN_MATERIALS = [
    MaterialDef("default", (0.75, 0.75, 0.75), 0.9),
    MaterialDef("sand", (0.82, 0.74, 0.52), 0.95, texture="noise_fine", image="sand"),
    MaterialDef("soil", (0.43, 0.30, 0.18), 0.95, texture="noise_coarse", image="soil"),
    MaterialDef("cliff", (0.45, 0.44, 0.46), 0.85, texture="noise_coarse", image="stone"),
    MaterialDef("rocks", (0.52, 0.50, 0.48), 0.9, texture="noise_mid", image="stone"),
    MaterialDef("grass", (0.30, 0.52, 0.18), 0.9, texture="noise_fine", image="grass"),
    MaterialDef("trunk", (0.36, 0.25, 0.13), 0.9, texture="stripes", image="bark"),
    MaterialDef("leaves", (0.20, 0.45, 0.12), 0.9, translucency=0.4, texture="noise_fine", image="leaves"),
    MaterialDef("plank", (0.62, 0.46, 0.26), 0.8, texture="stripes", image="planks"),
    MaterialDef("brick", (0.58, 0.22, 0.16), 0.85, texture="bricks", image="brick"),
    MaterialDef("glass", (0.95, 0.95, 0.98), 0.02, translucency=0.9),
    MaterialDef("water", (0.12, 0.25, 0.4), 0.05, translucency=0.6),
    MaterialDef("lantern_light", (1.0, 0.9, 0.7), 0.6, emissive=(14.0, 10.5, 6.0)),
    MaterialDef("torch_light", (1.0, 0.8, 0.5), 0.6, emissive=(10.0, 6.5, 3.0)),
    MaterialDef("flower", (0.85, 0.3, 0.35), 0.9),
] + [
    # shader-ball roughness ramp 0→1 (VoxelSceneGen.cu:121-161)
    MaterialDef(f"shaderball{i}", (0.9, 0.35, 0.1), i / 9.0, metallic=1.0 if i < 5 else 0.0)
    for i in range(10)
]


class MaterialTable(NamedTuple):
    """Device SoA parameter arrays, index = material id."""
    albedo: jnp.ndarray        # (N, 3) f32
    roughness: jnp.ndarray     # (N,)
    metallic: jnp.ndarray
    translucency: jnp.ndarray
    emissive: jnp.ndarray      # (N, 3)
    texture_id: jnp.ndarray    # (N,) i32, -1 = none
    image_id: jnp.ndarray      # (N,) i32 authored-texture slot, -1 = none
    uv_scale: jnp.ndarray
    block_to_mat: jnp.ndarray  # (B,) i32: block id → material index


@dataclass
class MaterialRegistry:
    materials: list = field(default_factory=lambda: list(_BUILTIN_MATERIALS))

    def __post_init__(self):
        self._by_name = {m.name: i for i, m in enumerate(self.materials)}

    @classmethod
    def from_yaml(cls, path: str) -> "MaterialRegistry":
        with open(path) as f:
            doc = yaml.safe_load(f)
        mats = [_BUILTIN_MATERIALS[0]]   # implicit default slot 0
        for e in doc.get("materials", []):
            mats.append(MaterialDef(
                name=e["name"],
                albedo=tuple(e.get("albedo", (0.8, 0.8, 0.8))),
                roughness=float(e.get("roughness", 0.8)),
                metallic=float(e.get("metallic", 0.0)),
                translucency=float(e.get("translucency", 0.0)),
                emissive=tuple(e.get("emissive", (0.0, 0.0, 0.0))),
                texture=e.get("texture"),
                image=e.get("image"),
                uv_scale=float(e.get("uv_scale", 1.0)),
            ))
        return cls(mats)

    def save_yaml(self, path: str) -> None:
        doc = {"materials": [
            {"name": m.name, "albedo": list(m.albedo), "roughness": m.roughness,
             "metallic": m.metallic, "translucency": m.translucency,
             "emissive": list(m.emissive), "texture": m.texture,
             "image": m.image, "uv_scale": m.uv_scale}
            for m in self.materials if m.name != "default"
        ]}
        with open(path, "w") as f:
            yaml.safe_dump(doc, f, sort_keys=False)

    def index_of(self, name: str | None) -> int:
        if name is None or name not in self._by_name:
            return 0
        return self._by_name[name]

    def add(self, mat: MaterialDef) -> int:
        """Dynamic material slot (MaterialManager.cpp:272-380)."""
        self.materials.append(mat)
        self._by_name[mat.name] = len(self.materials) - 1
        return len(self.materials) - 1

    def build_table(self, blocks: BlockRegistry,
                    texture_names: dict[str, int] | None = None,
                    image_names: dict[str, int] | None = None) -> MaterialTable:
        """image_names maps authored-texture names (image_textures atlas
        slots) — materials with `image` set sample the atlas in addition to
        (procedural) `texture` (TextureManager.cu:222-240 role)."""
        texture_names = texture_names or {}
        image_names = image_names or {}
        n = len(self.materials)
        alb = np.zeros((n, 3), np.float32)
        rough = np.zeros(n, np.float32)
        metal = np.zeros(n, np.float32)
        trans = np.zeros(n, np.float32)
        emis = np.zeros((n, 3), np.float32)
        tex = np.full(n, -1, np.int32)
        img = np.full(n, -1, np.int32)
        uvs = np.ones(n, np.float32)
        for i, mdef in enumerate(self.materials):
            alb[i] = mdef.albedo
            rough[i] = mdef.roughness
            metal[i] = mdef.metallic
            trans[i] = mdef.translucency
            emis[i] = mdef.emissive
            uvs[i] = mdef.uv_scale
            if mdef.texture is not None and mdef.texture in texture_names:
                tex[i] = texture_names[mdef.texture]
            if mdef.image is not None and mdef.image in image_names:
                img[i] = image_names[mdef.image]
        b2m = np.array(
            [self.index_of(b.material) for b in blocks.blocks], np.int32)
        return MaterialTable(
            albedo=jnp.asarray(alb), roughness=jnp.asarray(rough),
            metallic=jnp.asarray(metal), translucency=jnp.asarray(trans),
            emissive=jnp.asarray(emis), texture_id=jnp.asarray(tex),
            image_id=jnp.asarray(img),
            uv_scale=jnp.asarray(uvs), block_to_mat=jnp.asarray(b2m),
        )
