"""Format-layer tests.

Two pillars, mirroring and extending the reference's test strategy (§4 of
SURVEY.md): (a) struct-layout goldens — every on-disk record dtype's itemsize
equals the reference's ``size_of`` assertions; (b) synthetic-fixture round
trips through writer → parser.
"""

import io
import json

import numpy as np
import pytest

from mt_renderer_tpu import dti, fixtures
from mt_renderer_tpu.formats import arc, gmd, mfx, mod, mrl, sdl, spkg, tex, xfs
from mt_renderer_tpu.render import bcn
from mt_renderer_tpu.resources import ResourceManager


class TestStructSizes:
    """Golden record sizes (reference test fns, e.g. rarchive.rs:362-368)."""

    def test_arc(self):
        assert arc.HEADER_DTYPE.itemsize == 8
        assert arc.RESOURCE_INFO_DTYPE.itemsize == 0x90

    def test_mod(self):
        assert mod.MODEL_HDR_DTYPE.itemsize == 0xA0
        assert mod.PRIMITIVE_INFO_DTYPE.itemsize == 0x38
        assert mod.PARTS_INFO_DTYPE.itemsize == 0x20
        assert mod.BOUNDARY_INFO_DTYPE.itemsize == 0x90
        assert mod.JOINT_INFO_DTYPE.itemsize == 24
        assert mod.MATRIX_DTYPE.itemsize == 1 << 6

    def test_tex(self):
        assert tex.HEADER_DTYPE.itemsize == 0x10

    def test_mfx(self):
        assert mfx.HEADER_DTYPE.itemsize == 0x20
        assert mfx.OBJECT_DTYPE.itemsize == 0x28
        assert mfx.INPUT_ELEMENT_DTYPE.itemsize == 0x10
        assert mfx.INPUTLAYOUT_DTYPE.itemsize == 16
        assert mfx.STRUCT_DTYPE.itemsize == 16
        assert mfx.VARIABLE_DTYPE.itemsize == 0x30
        assert mfx.CBUFFER_DTYPE.itemsize == 24

    def test_mrl(self):
        assert mrl.HEADER_DTYPE.itemsize == 0x28
        assert mrl.TEXTURE_INFO_DTYPE.itemsize == 0x98
        assert mrl.MATERIAL_INFO_DTYPE.itemsize == 0x48
        assert mrl.MATERIAL_STATE_DTYPE.itemsize == 0x18

    def test_xfs(self):
        assert xfs.HEADER_DTYPE.itemsize == 0x18
        assert xfs.PROPERTY_INFO_DTYPE.itemsize == 0x30
        assert xfs.OBJECT_INFO_DTYPE.itemsize == 0x10

    def test_sdl(self):
        assert sdl.TRACK_DTYPE.itemsize == 0x30

    def test_gmd(self):
        assert gmd.INDEX_ITEM_DTYPE.itemsize == 1 << 5

    def test_spkg(self):
        assert spkg.HEADER_DTYPE.itemsize == 0x30
        assert spkg.INPUT_DTYPE.itemsize == 1 << 5
        assert spkg.CODE_INFO_DTYPE.itemsize == 1 << 4
        assert spkg.SHADER_DTYPE.itemsize == 0x70


class TestArchive:
    def test_round_trip(self):
        w = arc.ArchiveWriter()
        rtex = dti.from_name("rTexture")
        rmod = dti.from_name("rModel")
        w.add_file("a/b/file1", rtex, 2, b"hello" * 100)
        w.add_file("a\\b\\file2", rmod, 0, b"\x00" * 1000)
        blob = w.tobytes()

        a = arc.ArchiveFile(blob)
        infos = a.resource_infos()
        assert [i.path for i in infos] == ["a\\b\\file1", "a\\b\\file2"]
        assert infos[0].quality == 2
        assert a.get_resource("a/b/file1", rtex) == b"hello" * 100
        assert a.get_resource("a\\b\\file2", rmod) == b"\x00" * 1000
        # wrong DTI -> miss
        assert a.get_resource("a/b/file1", rmod) is None

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            arc.ArchiveFile(b"NOPE" + b"\x00" * 100)

    def test_unpack_repack(self, tmp_path):
        (tmp_path / "t.arc").write_bytes(fixtures.build_archive())
        n = arc.unpack_archive(tmp_path / "t.arc", tmp_path / "out")
        assert n == 8
        manifest = json.loads((tmp_path / "out" / "info.json").read_text())
        assert len(manifest) == 8
        arc.repack_archive(tmp_path / "out", tmp_path / "t2.arc")
        # repacked archive serves identical content
        a1 = arc.ArchiveFile((tmp_path / "t.arc").read_bytes())
        a2 = arc.ArchiveFile((tmp_path / "t2.arc").read_bytes())
        for info in a1.resource_infos():
            assert a2.get_resource(info.path, info.dti) == \
                a1.get_resource_by_info(info)


class TestResourceManager:
    def test_loose_first_then_archive(self, tmp_path):
        fixtures.write_fixture_tree(tmp_path)
        rm = ResourceManager(tmp_path)
        # loose file hit
        res = rm.get_resource("model/fixture_cube", dti.from_name("rModel"))
        assert res.read(4) == b"MOD\0"
        # archive mount via fancy path
        res = rm.get_resource_fancy(
            "fixture_scene:model\\fixture_albedo", dti.from_name("rTexture")
        )
        assert res.read(4) == b"TEX\0"
        # missing resource
        with pytest.raises(FileNotFoundError):
            rm.get_resource("nope/nothing", dti.from_name("rModel"))

    def test_archive_only(self, tmp_path):
        (tmp_path / "scene.arc").write_bytes(fixtures.build_archive())
        rm = ResourceManager(tmp_path)
        rm.add_archive("scene")
        res = rm.get_resource(fixtures.MODEL_PATH, dti.from_name("rModel"))
        assert res.read(4) == b"MOD\0"


class TestModel:
    def test_fixture_parse(self):
        m = mod.ModelFile(fixtures.build_model())
        assert m.material_names == ["fixture_mat"]
        assert len(m.primitives) == 2
        p = m.primitives[0]
        assert p.vertex_stride == 20
        assert p.topology == mod.TOPOLOGY_TRIANGLE_STRIP
        assert p.vertex_num == 8
        assert p.max_index == 7
        assert m.vertex_buf.nbytes == 8 * 20
        # strip B carries the 0xffff restart
        assert mod.STRIP_RESTART in m.index_buf.tolist()

    def test_skinned(self):
        m = mod.ModelFile(fixtures.build_model(skinned=True))
        assert len(m.joints) == 2
        assert m.joints[1].parent == 0
        assert m.inverse_bind_mats.shape == (2, 4, 4)
        assert m.joint_table.shape == (0x100,)
        assert m.primitives[0].weight_num == 1

    def test_primitive_bitfield_round_trip(self):
        p = mod.Primitive(
            draw_mode=1, vertex_num=1234, parts_no=5, material_no=7, lod=255,
            weight_num=4, alphapri=9, vertex_stride=28, topology=4,
            vertex_ofs=64, vertex_base=128, inputlayout=0xABC000,
            index_ofs=100, index_num=300, index_base=2,
            envelope=1, boundary_num=3, connect_id=77,
            min_index=2, max_index=900,
            disp=True, shape=False, sort=True, binormal_flip=True, bridge=False,
        )
        rec = p.pack_raw()
        q = mod.Primitive.from_raw(rec)
        assert p == q


class TestTexture:
    def test_rgba8(self):
        t = tex.TextureFile(fixtures.build_texture_rgba())
        assert (t.width, t.height) == (64, 64)
        img = t.decode_rgba8()
        assert np.array_equal(img, fixtures.checkerboard_rgba(64))

    def test_bc1_decode_matches_scalar_oracle(self):
        rng = np.random.default_rng(42)
        data = rng.integers(0, 256, size=16 * 8, dtype=np.uint8).tobytes()
        img = bcn.decode_bc1_numpy(data, 16, 4)
        for b in range(4):
            block = bcn.decode_bc1_block_scalar(data[b * 8:(b + 1) * 8])
            assert np.array_equal(img[0:4, b * 4:(b + 1) * 4], block)

    def test_bc1_fixture(self):
        t = tex.TextureFile(fixtures.build_texture_bc1())
        img = t.decode_rgba8()
        ref = fixtures.checkerboard_rgba(64)
        assert np.abs(img.astype(int) - ref.astype(int)).mean() < 4.0

    def test_prebias(self):
        img = fixtures.checkerboard_rgba(32)
        blob = tex.write_texture(32, 32, 7, [img.tobytes()], prebias=2)
        t = tex.TextureFile(blob)
        assert (t.width, t.height) == (32, 32)
        assert t.prebias == 2


class _BitWriter:
    """LSB-first bit packer for hand-built BC7 test blocks."""

    def __init__(self):
        self.bits = []

    def put(self, value, count):
        for i in range(count):
            self.bits.append((value >> i) & 1)
        return self

    def block(self) -> bytes:
        assert len(self.bits) <= 128
        self.bits += [0] * (128 - len(self.bits))
        out = bytearray(16)
        for i, b in enumerate(self.bits):
            out[i // 8] |= b << (i % 8)
        return bytes(out)


class TestBC7:
    def test_mode6_solid(self):
        w = _BitWriter()
        w.put(1 << 6, 7)                  # mode 6
        w.put(0x7F, 7); w.put(0, 7)       # R0, R1
        w.put(0, 7); w.put(0x7F, 7)       # G0, G1
        w.put(0, 7); w.put(0, 7)          # B0, B1
        w.put(0x7F, 7); w.put(0x7F, 7)    # A0, A1
        w.put(1, 1); w.put(1, 1)          # P0, P1
        # 63 index bits, all zero -> every texel = endpoint 0
        img = bcn.decode_bc7_numpy(w.block(), 4, 4)
        assert np.all(img == np.array([255, 1, 1, 255], dtype=np.uint8))

    def test_mode6_interp(self):
        w = _BitWriter()
        w.put(1 << 6, 7)
        w.put(0x7F, 7); w.put(0, 7)       # R: 255 -> 1
        w.put(0, 7); w.put(0, 7)
        w.put(0, 7); w.put(0, 7)
        w.put(0x7F, 7); w.put(0x7F, 7)
        w.put(1, 1); w.put(1, 1)
        # anchor texel (3 bits) = 4, rest (4 bits) = 8 -> weight 34
        w.put(4, 3)
        for _ in range(15):
            w.put(8, 4)
        img = bcn.decode_bc7_numpy(w.block(), 4, 4)
        # w=17 for index 4? weights[4]=17; anchor: (255*(64-17)+1*17+32)>>6
        exp_anchor = (255 * (64 - 17) + 1 * 17 + 32) >> 6
        exp_rest = (255 * (64 - 34) + 1 * 34 + 32) >> 6
        assert img[0, 0, 0] == exp_anchor
        assert img[0, 1, 0] == exp_rest
        assert np.all(img[..., 3] == 255)

    def test_mode5_alpha_and_rotation(self):
        w = _BitWriter()
        w.put(1 << 5, 6)                  # mode 5
        w.put(0, 2)                       # rotation 0
        w.put(0x7F, 7); w.put(0x7F, 7)    # R
        w.put(0, 7); w.put(0, 7)          # G
        w.put(0, 7); w.put(0, 7)          # B
        w.put(128, 8); w.put(128, 8)      # A
        img = bcn.decode_bc7_numpy(w.block(), 4, 4)
        assert np.all(img[..., 0] == 255)
        assert np.all(img[..., 3] == 128)

        # rotation 1 swaps R <-> A
        w2 = _BitWriter()
        w2.put(1 << 5, 6)
        w2.put(1, 2)
        w2.put(0x7F, 7); w2.put(0x7F, 7)
        w2.put(0, 7); w2.put(0, 7)
        w2.put(0, 7); w2.put(0, 7)
        w2.put(128, 8); w2.put(128, 8)
        img2 = bcn.decode_bc7_numpy(w2.block(), 4, 4)
        assert np.all(img2[..., 0] == 128)
        assert np.all(img2[..., 3] == 255)

    def test_mode1_two_subsets(self):
        w = _BitWriter()
        w.put(1 << 1, 2)                  # mode 1
        w.put(0, 6)                       # partition 0
        # R: e0a, e1a, e0b, e1b (6 bits each)
        w.put(0x3F, 6); w.put(0x3F, 6); w.put(0, 6); w.put(0, 6)
        w.put(0, 6); w.put(0, 6); w.put(0x3F, 6); w.put(0x3F, 6)  # G
        w.put(0, 6); w.put(0, 6); w.put(0, 6); w.put(0, 6)        # B
        w.put(1, 1); w.put(1, 1)          # shared p-bits per subset
        img = bcn.decode_bc7_numpy(w.block(), 4, 4)
        # partition 0 = [0,0,1,1] per row: left half red, right half green.
        # zero endpoints still pick up the p-bit: (0<<1|1) at 7 bits -> 2.
        assert np.all(img[:, 0:2, 0] == 255)
        assert np.all(img[:, 0:2, 1] == 2)
        assert np.all(img[:, 2:4, 1] == 255)
        assert np.all(img[:, 2:4, 0] == 2)
        assert np.all(img[..., 3] == 255)


class TestShader2:
    def test_handles(self):
        s2 = mfx.Shader2File(fixtures.build_shader2())
        il = s2.get_object_by_handle(mfx.object_handle(fixtures.INPUTLAYOUT_STATIC))
        assert il is not None and il.obj_type == mfx.ObjectType.INPUTLAYOUT
        assert il.specific.stride == 20
        assert [e.name for e in il.specific.elements] == ["Position", "TexCoord"]
        # unknown handle
        assert s2.get_object_by_handle(0xFFFFF000) is None

    def test_cbuffer(self):
        s2 = mfx.Shader2File(fixtures.build_shader2())
        cb = s2.get_object_by_name("CBMaterial")
        assert cb.obj_type == mfx.ObjectType.CBUFFER
        assert cb.specific.variables[0].name == "fAlbedoColor"
        assert cb.specific.variables[0].ctype == mfx.ClassType.CT_VECTOR


class TestMaterial:
    def test_albedo_binding(self):
        s2 = mfx.Shader2File(fixtures.build_shader2())
        mf = mrl.MaterialFile(fixtures.build_material(), s2)
        m = mf.material_by_name("fixture_mat")
        assert m is not None
        assert m.albedo_texture_idx == 0
        assert m.texture_bindings == {"tAlbedoMap": 0}
        assert m.mat_type.name == "nDraw::MaterialStd"
        assert mf.textures == ["model\\fixture_albedo"]


class TestXfs:
    def test_round_trip(self):
        blob = fixtures.build_character_prp(parts_disp=(True, False, True))
        cls = xfs.deserialize(blob)
        assert cls.class_type.name == "nGO::rCharacter"
        assert cls.get_prop("mpModel") == [["rModel", fixtures.MODEL_PATH]]
        assert cls.get_prop("PartsDisp") == [True, False, True]

    def test_prpz_wrapper(self):
        blob = fixtures.build_character_prp()
        wrapped = b"PRPZ" + b"\x00" * 8 + blob
        cls = xfs.deserialize(wrapped)
        assert cls.class_type.name == "nGO::rCharacter"

    def test_nested_class(self):
        inner = xfs.ClassSpec("MtObject", [
            xfs.PropSpec("mValue", xfs.PropType.s32),
        ])
        outer = xfs.ClassSpec("cResource", [
            xfs.PropSpec("mChild", xfs.PropType.classref),
            xfs.PropSpec("mName", xfs.PropType.string),
            xfs.PropSpec("mPos", xfs.PropType.vector3),
        ])
        root = ("cResource", {
            "mChild": [("MtObject", {"mValue": [42]})],
            "mName": ["テスト"],
            "mPos": [(1.0, 2.0, 3.0)],
        })
        cls = xfs.deserialize(xfs.serialize(root, [outer, inner]))
        assert cls.get_prop("mChild")[0].get_prop("mValue") == [42]
        assert cls.get_prop("mName") == ["テスト"]
        assert cls.get_prop("mPos") == [(1.0, 2.0, 3.0)]

    def test_null_classref(self):
        spec = xfs.ClassSpec("cResource", [
            xfs.PropSpec("mChild", xfs.PropType.classref),
        ])
        root = ("cResource", {"mChild": [None]})
        cls = xfs.deserialize(xfs.serialize(root, [spec]))
        assert cls.get_prop("mChild") == [None]

    # deserialize∘serialize identity across EVERY supported prop type
    # (the reference reads 12 static + 6 dynamic and todo!()s the rest,
    # mtserializer.rs:119-200; the extension layouts are pinned here)
    STATIC_VALUES = {
        xfs.PropType.u8: [0, 255], xfs.PropType.u16: [0, 65535],
        xfs.PropType.u32: [0, 2**32 - 1], xfs.PropType.u64: [2**63],
        xfs.PropType.s8: [-128, 127], xfs.PropType.s16: [-32768],
        xfs.PropType.s32: [-(2**31)], xfs.PropType.s64: [-(2**63)],
        xfs.PropType.bool_: [True, False],
        xfs.PropType.f32: [0.5, -2.25], xfs.PropType.f64: [1e-300],
        xfs.PropType.time: [-1234567890123],
        xfs.PropType.color: [0xDEADBEEF],
        xfs.PropType.string: ["テスト"], xfs.PropType.cstring: ["abc"],
        xfs.PropType.vector3: [(1.0, -0.5, 0.25)],
        xfs.PropType.vector4: [(1.0, 2.0, 3.0, 4.0)],
        xfs.PropType.quaternion: [(0.0, 0.0, 0.0, 1.0)],
        xfs.PropType.point: [(-3, 7)], xfs.PropType.size: [(640, 480)],
        xfs.PropType.rect: [(0, 0, 1920, 1080)],
        xfs.PropType.range: [(-5, 5)], xfs.PropType.rangef: [(0.5, 1.5)],
        xfs.PropType.rangeu16: [(3, 9)],
        xfs.PropType.float2: [(0.25, 0.75)],
        xfs.PropType.float3: [(1.0, 2.0, 3.0)],
        xfs.PropType.float4: [(1.0, 2.0, 3.0, 4.0)],
        xfs.PropType.float3x3: [tuple(float(i) for i in range(9))],
        xfs.PropType.float4x3: [tuple(float(i) for i in range(12))],
        xfs.PropType.float3x4: [tuple(float(i) for i in range(12))],
        xfs.PropType.float4x4: [tuple(float(i) for i in range(16))],
        xfs.PropType.matrix44: [tuple(float(i) for i in range(16))],
    }

    def test_roundtrip_every_static_type(self):
        props = [
            xfs.PropSpec(f"m_{pt.name}", pt) for pt in self.STATIC_VALUES
        ]
        spec = xfs.ClassSpec("MtObject", props)
        root = ("MtObject", {
            f"m_{pt.name}": vals for pt, vals in self.STATIC_VALUES.items()
        })
        cls = xfs.deserialize(xfs.serialize(root, [spec]))
        for pt, vals in self.STATIC_VALUES.items():
            got = cls.get_prop(f"m_{pt.name}")
            assert got == vals, f"{pt.name}: {got} != {vals}"

    def test_roundtrip_every_dynamic_type(self):
        from mt_renderer_tpu.dti import PROP_ATTR_DYNAMIC

        dyn = {
            xfs.PropType.custom: [["rModel", "path/to/thing"]],
            xfs.PropType.bool_: [True, False, True],
            xfs.PropType.s16: [-7, 7],
            xfs.PropType.s32: [-100000],
            xfs.PropType.u32: [3**20],
            xfs.PropType.classref: [("cResource", {"mVal": [5]})],
        }
        child = xfs.ClassSpec("cResource", [
            xfs.PropSpec("mVal", xfs.PropType.s32),
        ])
        props = [
            xfs.PropSpec(f"d_{pt.name}", pt, attr=PROP_ATTR_DYNAMIC)
            for pt in dyn
        ]
        spec = xfs.ClassSpec("MtObject", props)
        root = ("MtObject", {f"d_{pt.name}": v for pt, v in dyn.items()})
        cls = xfs.deserialize(xfs.serialize(root, [spec, child]))
        assert cls.get_prop("d_custom") == dyn[xfs.PropType.custom]
        assert cls.get_prop("d_bool_") == [True, False, True]
        assert cls.get_prop("d_s16") == [-7, 7]
        assert cls.get_prop("d_s32") == [-100000]
        assert cls.get_prop("d_u32") == [3**20]
        assert cls.get_prop("d_classref")[0].get_prop("mVal") == [5]


class TestGmd:
    def test_round_trip_bytes(self):
        blob = fixtures.build_gmd()
        g = gmd.GuiMessageFile.parse(blob)
        assert g.tobytes() == blob

    def test_json_interop(self):
        g = gmd.GuiMessageFile.parse(fixtures.build_gmd())
        j = g.to_json_obj()
        g2 = gmd.GuiMessageFile.from_json_obj(json.loads(json.dumps(j)))
        assert g2.tobytes() == g.tobytes()

    def test_hash_table_collision_chains(self):
        """>256 labels force slot collisions; the writer chains them via
        hash_link (the reference todo!()s here, rguimessage.rs:163) and
        the parser verifies every label is reachable."""
        msgs = [gmd.GuiMessage(f"LBL_{i:04d}", f"msg {i}") for i in range(300)]
        g = gmd.GuiMessageFile(language_id=1, package_name="pkg",
                               messages=msgs)
        blob = g.tobytes()
        # strict=True: every label must be reachable via OUR writer's
        # hash table — an unreachable one is a table-builder regression
        g2 = gmd.GuiMessageFile.parse(blob, strict=True)
        assert [m.label for m in g2.messages] == [m.label for m in msgs]
        assert g2.tobytes() == blob
        # corrupting a chain link must be detected
        import numpy as np

        hdr = gmd.HEADER_DTYPE.itemsize + len("pkg") + 1
        idx = np.frombuffer(blob, gmd.INDEX_ITEM_DTYPE, 300, offset=hdr).copy()
        linked = np.flatnonzero(idx["hash_link"] != 0)
        assert len(linked) > 0, "no collisions in 300 labels?"
        bad = bytearray(blob)
        ofs = hdr + int(linked[0]) * gmd.INDEX_ITEM_DTYPE.itemsize + 24
        bad[ofs:ofs + 8] = b"\0" * 8   # break one chain link
        # unreachable-by-hash labels WARN (the sequential index is
        # intact, so parsing proceeds — the reference never verifies
        # chains; only structurally impossible data raises)
        with pytest.warns(RuntimeWarning, match="hash table reaches"):
            g3 = gmd.GuiMessageFile.parse(bytes(bad))
        assert [m.label for m in g3.messages] == [m.label for m in msgs]
        # strict mode upgrades the same diagnosis to an error
        with pytest.raises(ValueError, match="hash table reaches"):
            gmd.GuiMessageFile.parse(bytes(bad), strict=True)

    def test_hash_verification(self):
        blob = bytearray(fixtures.build_gmd())
        # corrupt hash_a of the first index item
        hdr = gmd.HEADER_DTYPE.itemsize
        pkg_len = len("fixture_pkg") + 1
        blob[hdr + pkg_len + 4] ^= 0xFF
        with pytest.raises(ValueError, match="hash mismatch"):
            gmd.GuiMessageFile.parse(bytes(blob))


class TestScheduler:
    def test_round_trip(self):
        s = sdl.SchedulerFile(fixtures.build_scheduler())
        assert [t.track_type for t in s.tracks] == [
            sdl.TrackType.TYPE_ROOT, sdl.TrackType.TYPE_FLOAT,
            sdl.TrackType.TYPE_BOOL,
        ]
        f = s.tracks[1]
        assert [(k.frame, k.value) for k in f.keys] == [(0, 0.0), (30, 1.0)]
        assert s.value_at(f, 10) == 0.0
        assert s.value_at(f, 30) == 1.0

    def test_resource_track(self):
        tracks = [sdl.Track(
            sdl.TrackType.TYPE_RESOURCE, 0, "mpResource", 0,
            keys=[sdl.Key(0, 0, (dti.from_name("rModel").hash, "some\\model"))],
        )]
        s = sdl.SchedulerFile(sdl.write_scheduler(tracks))
        assert s.tracks[0].keys[0].value == (
            dti.from_name("rModel").hash, "some\\model")


class TestShaderPackage:
    def test_round_trip(self):
        s2 = mfx.Shader2File(fixtures.build_shader2())
        sp = spkg.ShaderPackageFile(fixtures.build_shader_package(), s2)
        assert sp.inputs[0].layouts[0].name == fixtures.INPUTLAYOUT_STATIC
        assert sp.vertex_shaders[0].code == b"\xde\xad\xbe\xef"
        assert sp.pixel_shaders[0].code == b"\xca\xfe"


class TestBc1Device:
    def test_device_matches_numpy(self):
        from mt_renderer_tpu.fixtures import checkerboard_rgba, encode_bc1_simple
        from mt_renderer_tpu.render.bcn import decode_bc1_device, decode_bc1_numpy

        img = checkerboard_rgba(64)
        data = encode_bc1_simple(img)
        want = decode_bc1_numpy(data, 64, 64)
        got = np.asarray(decode_bc1_device(np.frombuffer(data, np.uint8), 64, 64))
        np.testing.assert_array_equal(got, want)

    def test_jit_and_nonaligned(self):
        import jax

        from mt_renderer_tpu.render.bcn import decode_bc1_device, decode_bc1_numpy

        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, size=8 * 4 * 4, dtype=np.uint8).tobytes()
        want = decode_bc1_numpy(data, 13, 10)  # non-multiple-of-4 crop
        f = jax.jit(decode_bc1_device, static_argnums=(1, 2))
        got = np.asarray(f(np.frombuffer(data, np.uint8), 13, 10))
        np.testing.assert_array_equal(got, want)


class TestBc7Device:
    def _random_blocks_of_mode(self, mode, count, rng):
        blocks = rng.integers(0, 256, size=(count, 16), dtype=np.uint8)
        blocks[:, 0] = (1 << mode) | (
            (blocks[:, 0] << (mode + 1)) & 0xFF
        )  # force the mode prefix, randomize the rest of byte 0
        return blocks

    @pytest.mark.parametrize("mode", range(8))
    def test_each_mode_matches_numpy(self, mode):
        from mt_renderer_tpu.render.bcn import decode_bc7_device, decode_bc7_numpy

        rng = np.random.default_rng(mode)
        blocks = self._random_blocks_of_mode(mode, 8 * 8, rng)  # 32x32 px
        data = blocks.tobytes()
        want = decode_bc7_numpy(data, 32, 32)
        got = np.asarray(
            decode_bc7_device(np.frombuffer(data, np.uint8), 32, 32)
        )
        np.testing.assert_array_equal(got, want)

    def test_mixed_modes_jit(self):
        import jax

        from mt_renderer_tpu.render.bcn import decode_bc7_device, decode_bc7_numpy

        rng = np.random.default_rng(99)
        blocks = np.concatenate([
            self._random_blocks_of_mode(m, 4, rng) for m in range(8)
        ])
        data = blocks.tobytes()  # 32 blocks -> 16x8 blocks? use 8x4 grid
        want = decode_bc7_numpy(data, 32, 16)
        f = jax.jit(decode_bc7_device, static_argnums=(1, 2))
        got = np.asarray(f(np.frombuffer(data, np.uint8), 32, 16))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("mode", range(8))
    def test_single_texel_matches_numpy(self, mode):
        """The per-pixel sample-time decode (what a compressed-resident
        BC7 pool would run in the shade epilogue, priced by
        tools/bench/bc7_probe.py) is byte-exact vs the full-block
        oracle at every texel position of every mode."""
        import jax.numpy as jnp

        from mt_renderer_tpu.render.bcn import (bc7_texel_device,
                                                decode_bc7_numpy)

        rng = np.random.default_rng(100 + mode)
        nb = 32
        blocks = self._random_blocks_of_mode(mode, nb, rng)
        want = decode_bc7_numpy(blocks.tobytes(), 4 * nb, 4)
        w32 = blocks.reshape(nb, 4, 4).astype(np.uint32)
        w = (w32[:, :, 0] | (w32[:, :, 1] << 8) | (w32[:, :, 2] << 16)
             | (w32[:, :, 3] << 24))
        wrep = np.repeat(w, 16, axis=0)
        got = bc7_texel_device(
            [jnp.asarray(wrep[:, k]) for k in range(4)],
            jnp.asarray(np.tile(np.arange(16, dtype=np.int32), nb)),
            modes=(mode,))
        got = np.stack([np.asarray(g) for g in got], -1).reshape(nb, 16, 4)
        wantb = np.stack(
            [want[:, 4 * b:4 * b + 4].reshape(16, 4) for b in range(nb)])
        np.testing.assert_array_equal(got, wantb)

    @pytest.mark.parametrize("mode", (0, 1, 2, 3, 7))
    def test_single_texel_hint_matches(self, mode):
        """Baked per-block partition hints (subset word + anchors)
        reproduce the table-gather path exactly for every partitioned
        mode — the hint variant is what a compressed-resident BC7 pool
        would gather alongside the blocks."""
        import jax.numpy as jnp

        from mt_renderer_tpu.render.bcn import (bc7_block_hints,
                                                bc7_texel_device,
                                                decode_bc7_numpy)

        rng = np.random.default_rng(200 + mode)
        nb = 32
        blocks = self._random_blocks_of_mode(mode, nb, rng)
        want = decode_bc7_numpy(blocks.tobytes(), 4 * nb, 4)
        w32 = blocks.reshape(nb, 4, 4).astype(np.uint32)
        w = (w32[:, :, 0] | (w32[:, :, 1] << 8) | (w32[:, :, 2] << 16)
             | (w32[:, :, 3] << 24))
        wrep = np.repeat(w, 16, axis=0)
        hrep = np.repeat(bc7_block_hints(blocks), 16, axis=0)
        got = bc7_texel_device(
            [jnp.asarray(wrep[:, k]) for k in range(4)],
            jnp.asarray(np.tile(np.arange(16, dtype=np.int32), nb)),
            modes=(mode,),
            hint=(jnp.asarray(hrep[:, 0]), jnp.asarray(hrep[:, 1])))
        got = np.stack([np.asarray(g) for g in got], -1).reshape(nb, 16, 4)
        wantb = np.stack(
            [want[:, 4 * b:4 * b + 4].reshape(16, 4) for b in range(nb)])
        np.testing.assert_array_equal(got, wantb)

    def test_encode_mode6_roundtrip(self):
        """The synthetic-content mode-6 encoder produces decodable
        blocks: solid blocks round-trip within the shared-pbit +-1,
        smooth gradients within interpolation granularity."""
        from mt_renderer_tpu.render.bcn import (decode_bc7_numpy,
                                                encode_bc7_mode6_numpy)

        rng = np.random.default_rng(3)
        solid = np.repeat(np.repeat(
            rng.integers(0, 256, (4, 4, 4), np.uint8), 4, 0), 4, 1)
        dec = decode_bc7_numpy(
            encode_bc7_mode6_numpy(solid).tobytes(), 16, 16)
        assert np.abs(dec.astype(int) - solid.astype(int)).max() <= 1

        y, x = np.mgrid[0:32, 0:32]
        grad = np.stack([x * 8, y * 8, (x + y) * 4,
                         np.full_like(x, 255)], -1).astype(np.uint8)
        blk = encode_bc7_mode6_numpy(grad)
        assert set((blk[:, 0] & 0x7F).tolist()) == {0x40}   # all mode 6
        dec = decode_bc7_numpy(blk.tobytes(), 32, 32)
        assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 16

    def test_weight_formula_matches_tables(self):
        """_bc7_weight's arithmetic reproduces the spec weight tables
        (so the per-pixel path pays integer ops, not table gathers)."""
        import jax.numpy as jnp

        from mt_renderer_tpu.render.bcn import _WEIGHTS, _bc7_weight

        for ib, table in _WEIGHTS.items():
            calc = np.asarray(_bc7_weight(jnp.arange(len(table)), ib))
            np.testing.assert_array_equal(calc, table.astype(np.int64))


class TestConcurrency:
    def test_concurrent_archive_reads(self, tmp_path):
        """The reference serialises archive reads behind a Mutex
        (rarchive.rs:69,158) because its reader seeks; this ArchiveFile
        is backed by immutable bytes so concurrent reads need no lock."""
        import io
        from concurrent.futures import ThreadPoolExecutor

        from mt_renderer_tpu import dti, fixtures
        from mt_renderer_tpu.formats.arc import ArchiveFile

        archive = ArchiveFile(io.BytesIO(fixtures.build_archive()))
        infos = archive.resource_infos()
        want = [archive.get_resource_by_info(i) for i in infos]

        def read_all(_):
            return [archive.get_resource_by_info(i) for i in infos]

        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(read_all, range(32)))
        for r in results:
            assert r == want

    def test_concurrent_resource_manager(self, tmp_path):
        from concurrent.futures import ThreadPoolExecutor

        from mt_renderer_tpu import dti, fixtures
        from mt_renderer_tpu.resources import ResourceManager

        fixtures.write_fixture_tree(tmp_path)
        rm = ResourceManager(tmp_path)
        d = dti.from_name

        def fetch(_):
            return rm.get_resource_fancy(
                "fixture_scene:" + fixtures.MODEL_PATH.replace("\\", "/"),
                d("rModel"),
            ).read()

        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(fetch, range(16)))
        assert len({r for r in results}) == 1


class TestBc7Fixture:
    def test_fixture_texture_roundtrip(self):
        """Mode-5 encoded BC7 fixture decodes near-losslessly on both
        the host and device decoders through the TextureFile path."""
        import jax

        from mt_renderer_tpu.fixtures import build_texture_bc7, checkerboard_rgba
        from mt_renderer_tpu.formats.tex import TextureFile
        from mt_renderer_tpu.render.bcn import decode_bc7_device

        img = checkerboard_rgba(64)
        t = TextureFile(build_texture_bc7(64))
        host = t.decode_rgba8()
        assert np.abs(host.astype(int) - img.astype(int)).max() <= 1
        dev = np.asarray(
            decode_bc7_device(np.frombuffer(t.data, np.uint8), 64, 64)
        )
        np.testing.assert_array_equal(dev, host)
