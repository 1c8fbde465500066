#!/usr/bin/env python3
"""Hand-built HDF5 fixtures straight from the public format spec
(https://docs.hdfgroup.org/hdf5/develop/_f_m_t3.html) — an independent
second implementation (vs the Scala writer) so the reader is validated
against spec-derived bytes, not its own sibling.

File 1 (hand_contiguous.h5): superblock v0, root group with one
symbol-table entry, dataset "temp" float64[2,3] contiguous, one
attribute units="K".
File 2 (hand_chunked.h5): dataset "v" float32[6] chunked [2] with
deflate, 3 chunks via one B-tree v1 node.
"""
import struct, zlib

UNDEF = 0xFFFFFFFFFFFFFFFF

def u8(v): return struct.pack('<B', v)
def u16(v): return struct.pack('<H', v)
def u32(v): return struct.pack('<I', v)
def u64(v): return struct.pack('<Q', v)
def pad8(b): return b + b'\0' * ((8 - len(b) % 8) % 8)

SIG = bytes([0x89, ord('H'), ord('D'), ord('F'), 0x0d, 0x0a, 0x1a, 0x0a])

def superblock(root_oh, eof, btree, heap):
    b = SIG
    b += u8(0)*4            # sb ver, freespace ver, root group ver, reserved
    b += u8(0)+u8(8)+u8(8)+u8(0)  # shared msg ver, sizeof offsets/lengths, reserved
    b += u16(4)+u16(4)      # leaf k, internal k
    b += u32(0)             # consistency flags
    b += u64(0)+u64(UNDEF)+u64(eof)+u64(UNDEF)
    # root symbol table entry
    b += u64(0)+u64(root_oh)+u32(1)+u32(0)+u64(btree)+u64(heap)
    assert len(b) == 96
    return b

def message(tpe, body):
    body = pad8(body)
    return u16(tpe)+u16(len(body))+u8(0)+b'\0'*3+body

def object_header(msgs):
    data = b''.join(message(t, m) for t, m in msgs)
    return u8(1)+u8(0)+u16(len(msgs))+u32(1)+u32(len(data))+u32(0)+data

def dataspace(dims):
    return u8(1)+u8(len(dims))+u8(0)+u8(0)+u32(0)+b''.join(u64(d) for d in dims)

def dt_f64():
    # class 1 float, v1; LE, implied-msb norm, sign bit 63
    return u8((1<<4)|1)+u8(0x20)+u8(63)+u8(0)+u32(8)+u16(0)+u16(64)+u8(52)+u8(11)+u8(0)+u8(52)+u32(1023)

def dt_f32():
    return u8((1<<4)|1)+u8(0x20)+u8(31)+u8(0)+u32(4)+u16(0)+u16(32)+u8(23)+u8(8)+u8(0)+u8(23)+u32(127)

def dt_str(n):
    return u8((1<<4)|3)+u8(0)+u8(0)+u8(0)+u32(n)

def attr_v1(name, dt, ds, data):
    nb = name.encode()+b'\0'
    return (u8(1)+u8(0)+u16(len(nb))+u16(len(dt))+u16(len(ds))
            + pad8(nb)+pad8(dt)+pad8(ds)+data)

def layout_contiguous(addr, size):
    return u8(3)+u8(1)+u64(addr)+u64(size)

def layout_chunked(btree, chunk_dims, elem):
    return u8(3)+u8(2)+u8(len(chunk_dims)+1)+u64(btree)+b''.join(u32(d) for d in chunk_dims)+u32(elem)

def filters_deflate(level):
    return u8(1)+u8(1)+b'\0'*6 + u16(1)+u16(0)+u16(0)+u16(1)+u32(level)+u32(0)

def snod(entries):
    b = b'SNOD'+u8(1)+u8(0)+u16(len(entries))
    for name_off, oh in entries:
        b += u64(name_off)+u64(oh)+u32(0)+u32(0)+b'\0'*16
    return b

def group_btree(keys, children, final_key):
    b = b'TREE'+u8(0)+u8(0)+u16(len(children))+u64(UNDEF)+u64(UNDEF)
    for k, c in zip(keys, children):
        b += u64(k)+u64(c)
    b += u64(final_key)
    return b

def heap(data_addr, data):
    return b'HEAP'+u8(0)+b'\0'*3+u64(len(data))+u64(UNDEF)+u64(data_addr), data

# ---------------- file 1: contiguous float64[2,3] with units attr
def build_contiguous():
    vals = [273.15, 274.0, 275.5, 280.25, 281.0, 282.75]
    data_bytes = b''.join(struct.pack('<d', v) for v in vals)
    heap_data = pad8(b'\0'*8 + b'temp\0')
    name_off = 8
    # layout plan: sb(96) rootOH btree snod heapHdr heapData dsOH data
    root_oh = 96
    root_oh_bytes_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_oh_bytes_probe)
    btree_bytes = group_btree([name_off], [0], name_off)  # child patched below
    snod_addr = btree_addr + len(pad8(btree_bytes))
    snod_bytes_probe = snod([(name_off, 0)])
    heap_hdr_addr = snod_addr + len(pad8(snod_bytes_probe))
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    attr = attr_v1('units', dt_str(2), dataspace([]), b'K\0')
    ds_msgs_probe = [(0x01, dataspace([2,3])), (0x03, dt_f64()),
                     (0x08, layout_contiguous(0, 0)), (0x0C, attr)]
    ds_oh_probe = object_header(ds_msgs_probe)
    data_addr = ds_oh_addr + len(ds_oh_probe)
    eof = data_addr + len(data_bytes)

    ds_msgs = [(0x01, dataspace([2,3])), (0x03, dt_f64()),
               (0x08, layout_contiguous(data_addr, len(data_bytes))), (0x0C, attr)]
    ds_oh = object_header(ds_msgs)
    assert len(ds_oh) == len(ds_oh_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    assert len(root) == len(root_oh_bytes_probe)
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + data_bytes
    assert len(out) == eof, (len(out), eof)
    return out

# ---------------- file 2: chunked float32[6], chunk [2], deflate
def build_chunked():
    vals = [1.5, -2.5, 3.5, -4.5, 5.5, -6.5]
    chunks = []
    for ci in range(3):
        raw = b''.join(struct.pack('<f', v) for v in vals[ci*2:(ci+1)*2])
        chunks.append(zlib.compress(raw, 6))
    heap_data = pad8(b'\0'*8 + b'v\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    ds_msgs_probe = [(0x01, dataspace([6])), (0x03, dt_f32()),
                     (0x0B, filters_deflate(6)),
                     (0x08, layout_chunked(0, [2], 4))]
    ds_oh_probe = object_header(ds_msgs_probe)
    chunk_bt_addr = ds_oh_addr + len(ds_oh_probe)
    # chunk B-tree node type 1: key = size,u32 mask, offsets (rank+1 u64s)
    def chunk_key(size, off):
        return u32(size)+u32(0)+u64(off)+u64(0)
    node = b'TREE'+u8(1)+u8(0)+u16(3)+u64(UNDEF)+u64(UNDEF)
    # addresses of chunk data follow the node
    node_len_probe = len(node) + 3*(len(chunk_key(0,0))+8) + len(chunk_key(0,0))
    node_len = (node_len_probe + 7)//8*8
    data_addr = chunk_bt_addr + node_len
    addrs = []
    a = data_addr
    for c in chunks:
        addrs.append(a); a += (len(c)+7)//8*8
    eof = a
    for ci, (c, ad) in enumerate(zip(chunks, addrs)):
        node += chunk_key(len(c), ci*2)+u64(ad)
    node += chunk_key(0, 6)  # final key: one past the end
    node = node + b'\0'*(node_len - len(node))
    ds_msgs = [(0x01, dataspace([6])), (0x03, dt_f32()),
               (0x0B, filters_deflate(6)),
               (0x08, layout_chunked(chunk_bt_addr, [2], 4))]
    ds_oh = object_header(ds_msgs)
    assert len(ds_oh) == len(ds_oh_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + node
    for c in chunks:
        out += c + b'\0'*(((len(c)+7)//8*8) - len(c))
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_contiguous.h5','wb').write(build_contiguous())
open('/root/repo/src/test/resources/h5/hand_chunked.h5','wb').write(build_chunked())
print("fixtures written",
      len(build_contiguous()), len(build_chunked()))

# ---------------- file 3: netCDF-4-style decorations the subset skips:
# a vlen-class attribute (DIMENSION_LIST role) that must decode as an
# EMPTY attr, and a chunked dataset where chunk 1 is stored RAW with
# the deflate bit set in the B-tree key filter mask (libhdf5's
# incompressible-chunk behavior)
def dt_vlen():
    # class 9 vlen of f64 — reader must skip, not abort
    return u8((1<<4)|9)+u8(0)+u8(0)+u8(0)+u32(16)+dt_f64()

def build_nc4_decorated():
    vals = [10.5, 11.5, 12.5, 13.5, 14.5, 15.5]
    chunks = []
    for ci in range(3):
        raw = b''.join(struct.pack('<f', v) for v in vals[ci*2:(ci+1)*2])
        # chunk 1 "incompressible": stored raw, deflate bit set in mask
        chunks.append((zlib.compress(raw, 6), 0) if ci != 1 else (raw, 1))
    heap_data = pad8(b'\0'*8 + b'v\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    dimlist = attr_v1('DIMENSION_LIST', dt_vlen(), dataspace([1]),
                      b'\0'*16)  # payload bytes are opaque to the subset
    units = attr_v1('units', dt_str(2), dataspace([]), b'K\0')
    ds_msgs_probe = [(0x01, dataspace([6])), (0x03, dt_f32()),
                     (0x0B, filters_deflate(6)),
                     (0x08, layout_chunked(0, [2], 4)),
                     (0x0C, dimlist), (0x0C, units)]
    ds_oh_probe = object_header(ds_msgs_probe)
    chunk_bt_addr = ds_oh_addr + len(ds_oh_probe)
    def chunk_key(size, off):
        return u32(size)+u32(0)+u64(off)+u64(0)
    def chunk_key_m(size, mask, off):
        return u32(size)+u32(mask)+u64(off)+u64(0)
    node = b'TREE'+u8(1)+u8(0)+u16(3)+u64(UNDEF)+u64(UNDEF)
    node_len_probe = len(node) + 3*(len(chunk_key(0,0))+8) + len(chunk_key(0,0))
    node_len = (node_len_probe + 7)//8*8
    data_addr = chunk_bt_addr + node_len
    addrs = []
    a = data_addr
    for c, _ in chunks:
        addrs.append(a); a += (len(c)+7)//8*8
    eof = a
    for ci, ((c, mask), ad) in enumerate(zip(chunks, addrs)):
        node += chunk_key_m(len(c), mask, ci*2)+u64(ad)
    node += chunk_key(0, 6)
    node = node + b'\0'*(node_len - len(node))
    ds_msgs = [(0x01, dataspace([6])), (0x03, dt_f32()),
               (0x0B, filters_deflate(6)),
               (0x08, layout_chunked(chunk_bt_addr, [2], 4)),
               (0x0C, dimlist), (0x0C, units)]
    ds_oh = object_header(ds_msgs)
    assert len(ds_oh) == len(ds_oh_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + node
    for c, _ in chunks:
        out += c + b'\0'*(((len(c)+7)//8*8) - len(c))
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_nc4_decorated.h5','wb').write(build_nc4_decorated())
print("nc4-decorated fixture written", len(build_nc4_decorated()))

# ---------------- file 4: DENSE root group — Link Info message → fractal
# heap holding 20 link messages as managed objects + v2 B-tree (type 5)
# name index, checksums and record hashes via lookup3 (spec §III.A.2/G)
M32 = 0xffffffff

def lookup3(data, init=0):
    def rot(x, k): return ((x << k) | (x >> (32 - k))) & M32
    a = b = c = (0xdeadbeef + len(data) + init) & M32
    def word(o, n):
        v = 0
        for j in range(n):
            if o + j < len(data): v |= data[o + j] << (8 * j)
        return v
    i = 0; l = len(data)
    while l > 12:
        a = (a + word(i, 4)) & M32
        b = (b + word(i + 4, 4)) & M32
        c = (c + word(i + 8, 4)) & M32
        a = (a - c) & M32; a ^= rot(c, 4);  c = (c + b) & M32
        b = (b - a) & M32; b ^= rot(a, 6);  a = (a + c) & M32
        c = (c - b) & M32; c ^= rot(b, 8);  b = (b + a) & M32
        a = (a - c) & M32; a ^= rot(c, 16); c = (c + b) & M32
        b = (b - a) & M32; b ^= rot(a, 19); a = (a + c) & M32
        c = (c - b) & M32; c ^= rot(b, 4);  b = (b + a) & M32
        i += 12; l -= 12
    if l > 0:
        a = (a + word(i, min(l, 4))) & M32
        if l > 4: b = (b + word(i + 4, min(l - 4, 4))) & M32
        if l > 8: c = (c + word(i + 8, min(l - 8, 4))) & M32
        c ^= b; c = (c - rot(b, 14)) & M32
        a ^= c; a = (a - rot(c, 11)) & M32
        b ^= a; b = (b - rot(a, 25)) & M32
        c ^= b; c = (c - rot(b, 16)) & M32
        a ^= c; a = (a - rot(c, 4)) & M32
        b ^= a; b = (b - rot(a, 14)) & M32
        c ^= b; c = (c - rot(b, 24)) & M32
    return c

def link_msg(name, oh):
    nb = name.encode()
    return u8(1) + u8(0) + u8(len(nb)) + nb + u64(oh)

def superblock_dense(root_oh, eof):
    b = SIG
    b += u8(0)*4
    b += u8(0)+u8(8)+u8(8)+u8(0)
    b += u16(4)+u16(4)
    b += u32(0)
    b += u64(0)+u64(UNDEF)+u64(eof)+u64(UNDEF)
    # root symbol table entry, cache type 0 (no symbol table)
    b += u64(0)+u64(root_oh)+u32(0)+u32(0)+u64(0)+u64(0)
    assert len(b) == 96
    return b

def build_dense():
    nvars = 20
    names = ['d%02d' % i for i in range(nvars)]
    vals = {nm: [i * 10.0 + j for j in range(3)]
            for i, nm in enumerate(names)}
    root_oh = 96
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    FRHP_SIZE = 146
    fhdb_addr = frhp_addr + FRHP_SIZE
    bodies_probe = [link_msg(nm, 0) for nm in names]
    need = 17 + sum(len(x) for x in bodies_probe)
    block = 512
    while block < need: block <<= 1
    bthd_addr = fhdb_addr + block
    BTHD_SIZE = 38
    btlf_addr = bthd_addr + BTHD_SIZE
    rec_size = 11  # 4 hash + 7 heap id (1 flag + 4 offset + 2 length)
    btlf_used = 6 + nvars * rec_size + 4
    btlf_size = 512
    while btlf_size < btlf_used: btlf_size <<= 1
    cursor = btlf_addr + btlf_size
    oh_addrs = {}; data_addrs = {}
    for nm in names:
        probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0))])
        oh_addrs[nm] = cursor; cursor += len(probe)
        data_addrs[nm] = cursor; cursor += 24
    eof = cursor

    out = superblock_dense(root_oh, eof)
    root = object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])
    assert len(root) == len(root_probe)
    out += root

    bodies = [link_msg(nm, oh_addrs[nm]) for nm in names]
    links_bytes = sum(len(x) for x in bodies)
    frhp = b'FRHP' + u8(0) + u16(7) + u16(0) + u8(0)
    frhp += u32(block)                       # max managed object size
    frhp += u64(0) + u64(UNDEF)              # next huge id, huge btree
    frhp += u64(block - 17 - links_bytes)    # free space
    frhp += u64(UNDEF)                       # free-space manager
    frhp += u64(block) + u64(block)          # managed, allocated
    frhp += u64(17 + links_bytes)            # iterator offset
    frhp += u64(nvars)                       # managed object count
    frhp += u64(0)*4                         # huge/tiny size+count
    frhp += u16(4)                           # table width
    frhp += u64(block) + u64(block)          # starting/max direct size
    frhp += u16(32) + u16(1)                 # max heap bits, start rows
    frhp += u64(fhdb_addr) + u16(0)          # root block addr, cur rows
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    offsets = {}
    for nm, body in zip(names, bodies):
        offsets[nm] = len(fhdb)
        fhdb += body
    fhdb += b'\0' * (block - len(fhdb))
    out += fhdb

    bthd = b'BTHD' + u8(0) + u8(5) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(nvars) + u64(nvars)
    bthd += u32(lookup3(bthd))
    assert len(bthd) == BTHD_SIZE
    out += bthd

    recs = sorted((lookup3(nm.encode()), nm) for nm in names)
    btlf = b'BTLF' + u8(0) + u8(5)
    for h, nm in recs:
        btlf += u32(h) + u8(0) + u32(offsets[nm]) + u16(len(link_msg(nm, 0)))
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    for nm in names:
        assert len(out) == oh_addrs[nm]
        data = b''.join(struct.pack('<d', v) for v in vals[nm])
        out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(data_addrs[nm], 24))])
        assert len(out) == data_addrs[nm]
        out += data
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_dense.h5','wb').write(build_dense())
print("dense fixture written", len(build_dense()))

# ---------------- file 5: dense root group whose v2 B-tree has DEPTH 1
# (BTIN root with a separator record + two BTLF leaves) — the shape
# libhdf5 produces past ~185 links, scaled down via a small node size
def build_dense_deep():
    nvars = 21
    names = ['e%02d' % i for i in range(nvars)]
    vals = {nm: [i * 7.0 + j for j in range(3)]
            for i, nm in enumerate(names)}
    node_size = 120          # maxLeafRec = (120-10)//11 = 10 per leaf
    rec_size = 11
    root_oh = 96
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    FRHP_SIZE = 146
    fhdb_addr = frhp_addr + FRHP_SIZE
    bodies_probe = [link_msg(nm, 0) for nm in names]
    need = 17 + sum(len(x) for x in bodies_probe)
    block = 512
    while block < need: block <<= 1
    bthd_addr = fhdb_addr + block
    BTHD_SIZE = 38
    btin_addr = bthd_addr + BTHD_SIZE
    leaf1_addr = btin_addr + node_size
    leaf2_addr = leaf1_addr + node_size
    cursor = leaf2_addr + node_size
    oh_addrs = {}; data_addrs = {}
    for nm in names:
        probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0))])
        oh_addrs[nm] = cursor; cursor += len(probe)
        data_addrs[nm] = cursor; cursor += 24
    eof = cursor

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    bodies = [link_msg(nm, oh_addrs[nm]) for nm in names]
    links_bytes = sum(len(x) for x in bodies)
    frhp = b'FRHP' + u8(0) + u16(7) + u16(0) + u8(0)
    frhp += u32(block)
    frhp += u64(0) + u64(UNDEF)
    frhp += u64(block - 17 - links_bytes)
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(17 + links_bytes)
    frhp += u64(nvars)
    frhp += u64(0)*4
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    offsets = {}
    for nm, body in zip(names, bodies):
        offsets[nm] = len(fhdb)
        fhdb += body
    fhdb += b'\0' * (block - len(fhdb))
    out += fhdb

    # hash-sorted records; 10 to leaf1, #11 is the BTIN separator,
    # 10 to leaf2
    recs = sorted((lookup3(nm.encode()), nm) for nm in names)
    def record(h, nm):
        return u32(h) + u8(0) + u32(offsets[nm]) + u16(len(link_msg(nm, 0)))
    bthd = b'BTHD' + u8(0) + u8(5) + u32(node_size) + u16(rec_size) + u16(1)
    bthd += u8(100) + u8(40) + u64(btin_addr) + u16(1) + u64(nvars)
    bthd += u32(lookup3(bthd))
    assert len(bthd) == BTHD_SIZE
    out += bthd

    btin = b'BTIN' + u8(0) + u8(5)
    btin += record(*recs[10])
    btin += u64(leaf1_addr) + u8(10)   # child nrec field: 1 byte (max 10)
    btin += u64(leaf2_addr) + u8(10)
    btin += u32(lookup3(btin))
    btin += b'\0' * (node_size - len(btin))
    out += btin

    for leaf_recs in (recs[:10], recs[11:]):
        leaf = b'BTLF' + u8(0) + u8(5)
        for h, nm in leaf_recs:
            leaf += record(h, nm)
        leaf += u32(lookup3(leaf))
        leaf += b'\0' * (node_size - len(leaf))
        out += leaf

    for nm in names:
        assert len(out) == oh_addrs[nm]
        data = b''.join(struct.pack('<d', v) for v in vals[nm])
        out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(data_addrs[nm], 24))])
        assert len(out) == data_addrs[nm]
        out += data
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_dense_deep.h5','wb').write(build_dense_deep())
print("deep dense fixture written", len(build_dense_deep()))

# ---------------- file 6: dataset with DENSE attribute storage —
# Attribute Info message (0x15) → fractal heap of attribute messages +
# v2 B-tree type 8 (heapID(8) + flags(1) + corder(4) + hash(4) records)
def build_dense_attrs():
    # 10 CF-ish attributes: beyond libhdf5's 8-attr compact limit
    attr_specs = [('units', 'K'), ('long_name', 'temperature'),
                  ('standard_name', 'sea_surface_temp'), ('comment', 'x'),
                  ('source', 'synth'), ('coordinates', 'lat lon'),
                  ('grid_mapping', 'crs'), ('cell_methods', 'mean'),
                  ('history', 'v1'), ('references', 'doc')]
    attr_msgs = [attr_v1(n, dt_str(len(v)+1), dataspace([]), v.encode()+b'\0')
                 for n, v in attr_specs]
    vals = [300.0, 301.0, 302.0]
    heap_data = pad8(b'\0'*8 + b'temp\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    # dataset OH: dataspace, datatype, layout, ATTRIBUTE INFO (0x15)
    attr_info_probe = u8(0)+u8(0)+u64(0)+u64(0)
    ds_probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(0, 0)),
                              (0x15, attr_info_probe)])
    frhp_addr = ds_oh_addr + len(ds_probe)
    FRHP_SIZE = 146
    fhdb_addr = frhp_addr + FRHP_SIZE
    need = 17 + sum(len(m) for m in attr_msgs)
    block = 512
    while block < need: block <<= 1
    bthd_addr = fhdb_addr + block
    BTHD_SIZE = 38
    btlf_addr = bthd_addr + BTHD_SIZE
    rec_size = 17  # heapID(8) + flags(1) + corder(4) + hash(4)
    btlf_used = 6 + len(attr_specs) * rec_size + 4
    btlf_size = 512
    while btlf_size < btlf_used: btlf_size <<= 1
    data_addr = btlf_addr + btlf_size
    eof = data_addr + 24

    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    out += pad8(group_btree([name_off], [snod_addr], name_off))
    out += pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out += hh + hd
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(data_addr, 24)),
                          (0x15, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    msgs_bytes = sum(len(m) for m in attr_msgs)
    frhp = b'FRHP' + u8(0) + u16(7) + u16(0) + u8(0)
    frhp += u32(block)
    frhp += u64(0) + u64(UNDEF)
    frhp += u64(block - 17 - msgs_bytes)
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(17 + msgs_bytes)
    frhp += u64(len(attr_specs))
    frhp += u64(0)*4
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    offsets = {}
    for (n, _), m in zip(attr_specs, attr_msgs):
        offsets[n] = len(fhdb)
        fhdb += m
    fhdb += b'\0' * (block - len(fhdb))
    out += fhdb

    bthd = b'BTHD' + u8(0) + u8(8) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(len(attr_specs))
    bthd += u64(len(attr_specs))
    bthd += u32(lookup3(bthd))
    assert len(bthd) == BTHD_SIZE
    out += bthd

    recs = sorted((lookup3(n.encode()), n) for n, _ in attr_specs)
    btlf = b'BTLF' + u8(0) + u8(8)
    for corder, (h, n) in enumerate(recs):
        m = [m for (an, _), m in zip(attr_specs, attr_msgs) if an == n][0]
        heap_id = u8(0) + u32(offsets[n]) + u16(len(m)) + u8(0)  # 7B id + pad
        btlf += heap_id + u8(0) + u32(corder) + u32(h)
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    assert len(out) == data_addr, (len(out), data_addr)
    out += b''.join(struct.pack('<d', v) for v in vals)
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_dense_attrs.h5','wb').write(build_dense_attrs())
print("dense-attrs fixture written", len(build_dense_attrs()))

# ---------------- file 7: dense root whose fractal heap has a ROOT
# INDIRECT block with direct rows AND a nested indirect row (width 2,
# start=max-direct=512: rows 0-1 direct, row 2 indirect; each child
# subdivides its 1024-byte span with the same doubling table → 1 row
# of two 512-byte direct blocks). 7 links, one per direct block.
def build_heap_nested():
    width, start = 2, 512
    names = ['n%d' % i for i in range(7)]
    blk_off = [0, 512, 1024, 1536, 2048, 2560, 3072]
    root_oh = 96
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    FRHP_SIZE = 146
    fhib_addr = frhp_addr + FRHP_SIZE
    fhib_size = 4+1+8+4 + 6*8 + 4
    child1_addr = fhib_addr + fhib_size
    child_size = 4+1+8+4 + 2*8 + 4
    child2_addr = child1_addr + child_size
    d_addrs = [child2_addr + child_size + i*512 for i in range(7)]
    bthd_addr = d_addrs[-1] + 512
    BTHD_SIZE = 38
    btlf_addr = bthd_addr + BTHD_SIZE
    rec_size = 11
    btlf_size = 512
    cursor = btlf_addr + btlf_size
    oh_addrs = {}; data_addrs = {}
    for nm in names:
        probe = object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0))])
        oh_addrs[nm] = cursor; cursor += len(probe)
        data_addrs[nm] = cursor; cursor += 16
    eof = cursor

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    links_bytes = sum(len(link_msg(nm, 0)) for nm in names)
    frhp = b'FRHP' + u8(0) + u16(7) + u16(0) + u8(0)
    frhp += u32(512)
    frhp += u64(0) + u64(UNDEF)
    frhp += u64(7*512 - 7*17 - links_bytes)
    frhp += u64(UNDEF)
    frhp += u64(4096) + u64(3584)
    frhp += u64(0)
    frhp += u64(len(names))
    frhp += u64(0)*4
    frhp += u16(width)
    frhp += u64(start) + u64(start)      # max direct == start
    frhp += u16(32) + u16(3)             # 4-byte offsets, 3 starting rows
    frhp += u64(fhib_addr) + u16(3)      # root indirect with 3 rows
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhib = b'FHIB' + u8(0) + u64(frhp_addr) + u32(0)
    fhib += u64(d_addrs[0]) + u64(d_addrs[1])       # row 0: direct
    fhib += u64(d_addrs[2]) + u64(d_addrs[3])       # row 1: direct
    fhib += u64(child1_addr) + u64(child2_addr)     # row 2: indirect
    fhib += u32(lookup3(fhib))
    assert len(fhib) == fhib_size
    out += fhib
    c1 = b'FHIB' + u8(0) + u64(frhp_addr) + u32(2048)
    c1 += u64(d_addrs[4]) + u64(d_addrs[5])
    c1 += u32(lookup3(c1))
    assert len(c1) == child_size
    c2 = b'FHIB' + u8(0) + u64(frhp_addr) + u32(3072)
    c2 += u64(d_addrs[6]) + u64(UNDEF)
    c2 += u32(lookup3(c2))
    out += c1 + c2

    offsets = {}
    for nm, boff, da in zip(names, blk_off, d_addrs):
        assert len(out) == da
        blk = b'FHDB' + u8(0) + u64(frhp_addr) + u32(boff)
        offsets[nm] = boff + len(blk)
        blk += link_msg(nm, oh_addrs[nm])
        blk += b'\0' * (512 - len(blk))
        out += blk

    bthd = b'BTHD' + u8(0) + u8(5) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(len(names)) + u64(len(names))
    bthd += u32(lookup3(bthd))
    assert len(bthd) == BTHD_SIZE
    out += bthd

    recs = sorted((lookup3(nm.encode()), nm) for nm in names)
    btlf = b'BTLF' + u8(0) + u8(5)
    for h, nm in recs:
        btlf += u32(h) + u8(0) + u32(offsets[nm]) + u16(len(link_msg(nm, 0)))
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    for i, nm in enumerate(names):
        assert len(out) == oh_addrs[nm]
        data = struct.pack('<d', i * 2.0) + struct.pack('<d', i * 2.0 + 1)
        out += object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(data_addrs[nm], 16))])
        assert len(out) == data_addrs[nm]
        out += data
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_heap_nested.h5','wb').write(build_heap_nested())
print("nested-heap fixture written", len(build_heap_nested()))

# ---------------- file 8: dense root with a FILTERED fractal heap —
# the root direct block is deflate-compressed; FRHP carries the
# filtered-root size + mask + pipeline message body (ioFilterLen > 0)
def build_heap_filtered():
    names = ['f0', 'f1', 'f2']
    root_oh = 96
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    finfo = filters_deflate(6)
    FRHP_SIZE = 146 + 8 + 4 + len(finfo)
    fhdb_addr = frhp_addr + FRHP_SIZE
    block = 512          # logical (decompressed) block size
    stored_cap = 256     # reserved file space for the compressed bytes
    bthd_addr = fhdb_addr + stored_cap
    BTHD_SIZE = 38
    btlf_addr = bthd_addr + BTHD_SIZE
    rec_size = 11
    btlf_size = 512
    cursor = btlf_addr + btlf_size
    oh_addrs = {}; data_addrs = {}
    for nm in names:
        probe = object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0))])
        oh_addrs[nm] = cursor; cursor += len(probe)
        data_addrs[nm] = cursor; cursor += 16
    eof = cursor

    # plaintext block with final OH addresses, then compress
    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    offsets = {}
    for nm in names:
        offsets[nm] = len(fhdb)
        fhdb += link_msg(nm, oh_addrs[nm])
    fhdb += b'\0' * (block - len(fhdb))
    comp = zlib.compress(fhdb, 6)
    assert len(comp) <= stored_cap

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    links_bytes = sum(len(link_msg(nm, 0)) for nm in names)
    frhp = b'FRHP' + u8(0) + u16(7) + u16(len(finfo)) + u8(0)
    frhp += u32(block)
    frhp += u64(0) + u64(UNDEF)
    frhp += u64(block - 17 - links_bytes)
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(17 + links_bytes)
    frhp += u64(len(names))
    frhp += u64(0)*4
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u64(len(comp)) + u32(0)      # filtered root size + mask
    frhp += finfo                        # I/O filter information
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp
    out += comp + b'\0' * (stored_cap - len(comp))

    bthd = b'BTHD' + u8(0) + u8(5) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(len(names)) + u64(len(names))
    bthd += u32(lookup3(bthd))
    out += bthd

    recs = sorted((lookup3(nm.encode()), nm) for nm in names)
    btlf = b'BTLF' + u8(0) + u8(5)
    for h, nm in recs:
        btlf += u32(h) + u8(0) + u32(offsets[nm]) + u16(len(link_msg(nm, 0)))
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    for i, nm in enumerate(names):
        assert len(out) == oh_addrs[nm]
        data = struct.pack('<d', 100.0 + i) + struct.pack('<d', 200.0 + i)
        out += object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(data_addrs[nm], 16))])
        assert len(out) == data_addrs[nm]
        out += data
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_heap_filtered.h5','wb').write(build_heap_filtered())
print("filtered-heap fixture written", len(build_heap_filtered()))

# ---------------- file 9: dense root whose v2 B-tree has DEPTH 2 —
# 24 links at node_size 64 (leaf cap 4, internal cap 2): root BTIN
# with 2 separators + 3 depth-1 BTINs, each over 3 BTLF leaves.
# Child pointers at depth 2 carry the 1-byte subtree-total field
# (cum max 14 at depth 1).
def build_btree_depth2():
    nvars = 24
    node_size, rec_size = 64, 11
    names = ['q%02d' % i for i in range(nvars)]
    root_oh = 96
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    FRHP_SIZE = 146
    fhdb_addr = frhp_addr + FRHP_SIZE
    bodies = [link_msg(nm, 0) for nm in names]
    need = 17 + sum(len(x) for x in bodies)
    block = 512
    while block < need: block <<= 1
    bthd_addr = fhdb_addr + block
    BTHD_SIZE = 38
    root_addr = bthd_addr + BTHD_SIZE
    int_addrs = [root_addr + node_size * (1 + i) for i in range(3)]
    leaf_addrs = [root_addr + node_size * (4 + i) for i in range(9)]
    cursor = root_addr + node_size * 13
    oh_addrs = {}; data_addrs = {}
    for nm in names:
        probe = object_header([(0x01, dataspace([1])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0))])
        oh_addrs[nm] = cursor; cursor += len(probe)
        data_addrs[nm] = cursor; cursor += 8
    eof = cursor

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    links_bytes = sum(len(x) for x in bodies)
    frhp = b'FRHP' + u8(0) + u16(7) + u16(0) + u8(0)
    frhp += u32(block)
    frhp += u64(0) + u64(UNDEF)
    frhp += u64(block - 17 - links_bytes)
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(17 + links_bytes)
    frhp += u64(nvars)
    frhp += u64(0)*4
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    offsets = {}
    for nm, body in zip(names, [link_msg(nm, oh_addrs[nm]) for nm in names]):
        offsets[nm] = len(fhdb)
        fhdb += body
    fhdb += b'\0' * (block - len(fhdb))
    out += fhdb

    recs = sorted((lookup3(nm.encode()), nm) for nm in names)
    def record(h, nm):
        return u32(h) + u8(0) + u32(offsets[nm]) + u16(len(link_msg(nm, 0)))
    # subtree shapes: A = recs[0:8] (leaves 2/2/2), B = recs[9:16]
    # (2/2/1), C = recs[17:24] (2/2/1); root separators recs[8], recs[16]
    leaf_groups = [recs[0:2], recs[3:5], recs[6:8],
                   recs[9:11], recs[12:14], recs[15:16],
                   recs[17:19], recs[20:22], recs[23:24]]
    int_seps = [[recs[2], recs[5]], [recs[11], recs[14]], [recs[19], recs[22]]]
    subtree_totals = [8, 7, 7]

    bthd = b'BTHD' + u8(0) + u8(5) + u32(node_size) + u16(rec_size) + u16(2)
    bthd += u8(100) + u8(40) + u64(root_addr) + u16(2) + u64(nvars)
    bthd += u32(lookup3(bthd))
    assert len(bthd) == BTHD_SIZE
    out += bthd

    root = b'BTIN' + u8(0) + u8(5)
    root += record(*recs[8]) + record(*recs[16])
    for i in range(3):
        root += u64(int_addrs[i]) + u8(2) + u8(subtree_totals[i])
    root += u32(lookup3(root))
    assert len(root) <= node_size
    out += root + b'\0' * (node_size - len(root))

    for i in range(3):
        node = b'BTIN' + u8(0) + u8(5)
        for sep in int_seps[i]:
            node += record(*sep)
        for j in range(3):
            node += u64(leaf_addrs[3*i + j]) + u8(len(leaf_groups[3*i + j]))
        node += u32(lookup3(node))
        assert len(node) <= node_size
        out += node + b'\0' * (node_size - len(node))

    for lg in leaf_groups:
        leaf = b'BTLF' + u8(0) + u8(5)
        for h, nm in lg:
            leaf += record(h, nm)
        leaf += u32(lookup3(leaf))
        assert len(leaf) <= node_size
        out += leaf + b'\0' * (node_size - len(leaf))

    for i, nm in enumerate(names):
        assert len(out) == oh_addrs[nm]
        out += object_header([(0x01, dataspace([1])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(data_addrs[nm], 8))])
        assert len(out) == data_addrs[nm]
        out += struct.pack('<d', i * 3.0)
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_btree_depth2.h5','wb').write(build_btree_depth2())
print("depth-2 B-tree fixture written", len(build_btree_depth2()))

# ---------------- file 10: netCDF-4-style dimension identity — "sst"
# carries a DIMENSION_LIST attribute (class-9 vlen sequence of class-7
# object references) resolved through a global heap collection (GCOL),
# plus a vlen-STRING attribute; the references point at the "lat"/"lon"
# dimension-scale datasets.
def dt_vlen_ref():
    # vlen sequence (kind 0), 16-byte datum, base = object reference
    return (u8((1<<4)|9)+u8(0)+u8(0)+u8(0)+u32(16)
            + u8((1<<4)|7)+u8(0)+u8(0)+u8(0)+u32(8))

def dt_vlen_str():
    # vlen string (kind 1), 16-byte datum, base = 1-byte char
    return u8((1<<4)|9)+u8(1)+u8(0)+u8(0)+u32(16) + dt_str(1)

def build_dimension_list():
    lat_vals = [-0.5, 0.5]
    lon_vals = [10.0, 11.0, 12.0]
    sst_vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    summary = b'synthetic granule'
    heap_data = pad8(b'\0'*8 + b'lat\0' + b'lon\0' + b'sst\0')
    off_lat, off_lon, off_sst = 8, 12, 16
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([off_lat], [0], off_sst))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(off_lat, 0), (off_lon, 0), (off_sst, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    lat_oh = heap_data_addr + len(heap_data)
    coord_probe = object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                                 (0x08, layout_contiguous(0, 0))])
    lat_data = lat_oh + len(coord_probe)
    lon_oh = lat_data + 16
    lon_probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0))])
    lon_data = lon_oh + len(lon_probe)
    sst_oh = lon_data + 24
    # sst attrs: DIMENSION_LIST (2 vlen-of-ref datums) + summary (vlen str)
    dimlist_probe = attr_v1('DIMENSION_LIST', dt_vlen_ref(), dataspace([2]),
                            (u32(1)+u64(0)+u32(1)) + (u32(1)+u64(0)+u32(2)))
    summary_probe = attr_v1('summary', dt_vlen_str(), dataspace([]),
                            u32(len(summary))+u64(0)+u32(3))
    sst_probe = object_header([(0x01, dataspace([2, 3])), (0x03, dt_f64()),
                               (0x08, layout_contiguous(0, 0)),
                               (0x0C, dimlist_probe), (0x0C, summary_probe)])
    sst_data = sst_oh + len(sst_probe)
    gcol_addr = sst_data + 48
    gcol_size = 512
    eof = gcol_addr + gcol_size

    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    out += pad8(group_btree([off_lat], [snod_addr], off_sst))
    out += pad8(snod([(off_lat, lat_oh), (off_lon, lon_oh), (off_sst, sst_oh)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out += hh + hd
    out += object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(lat_data, 16))])
    out += b''.join(struct.pack('<d', v) for v in lat_vals)
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(lon_data, 24))])
    out += b''.join(struct.pack('<d', v) for v in lon_vals)
    dimlist = attr_v1('DIMENSION_LIST', dt_vlen_ref(), dataspace([2]),
                      (u32(1)+u64(gcol_addr)+u32(1))
                      + (u32(1)+u64(gcol_addr)+u32(2)))
    summ = attr_v1('summary', dt_vlen_str(), dataspace([]),
                   u32(len(summary))+u64(gcol_addr)+u32(3))
    out += object_header([(0x01, dataspace([2, 3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(sst_data, 48)),
                          (0x0C, dimlist), (0x0C, summ)])
    assert len(out) == sst_data, (len(out), sst_data)
    out += b''.join(struct.pack('<d', v) for v in sst_vals)

    # global heap collection: two reference objects + the string
    assert len(out) == gcol_addr
    gcol = b'GCOL' + u8(1) + b'\0'*3 + u64(gcol_size)
    def gobj(idx, data):
        return u16(idx)+u16(1)+u32(0)+u64(len(data)) + pad8(data)
    gcol += gobj(1, u64(lat_oh))
    gcol += gobj(2, u64(lon_oh))
    gcol += gobj(3, summary)
    free = gcol_size - len(gcol)
    gcol += u16(0)+u16(0)+u32(0)+u64(free)
    gcol += b'\0' * (gcol_size - len(gcol))
    out += gcol
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_dimension_list.h5','wb').write(build_dimension_list())
print("dimension-list fixture written", len(build_dimension_list()))

# ---------------- soft links: compact 0x06 link messages in the root
# object header — hard "base", absolute/relative/nested-soft aliases,
# a "." path component, and a dangling target that must be skipped
# (spec §IV "Link Message", link type 1: 2-byte length + path bytes)

def soft_link_msg(name, path):
    nb = name.encode(); pb = path.encode()
    return u8(1) + u8(0x08) + u8(1) + u8(len(nb)) + nb + u16(len(pb)) + pb

def build_soft_links():
    root_oh = 96
    vals = [1.25, -2.5, 3.75]
    data = b''.join(struct.pack('<d', v) for v in vals)
    def root(ds_oh, grp_oh):
        return object_header([
            (0x06, link_msg('base', ds_oh)),
            (0x06, soft_link_msg('alias', '/base')),
            (0x06, soft_link_msg('rel', 'base')),
            (0x06, soft_link_msg('chain', '/alias')),
            (0x06, soft_link_msg('dot', './base')),
            (0x06, soft_link_msg('dangling', '/missing')),
            (0x06, link_msg('g', grp_oh)),
        ])
    def grp():
        # subgroup with '..' paths: HDF5 defines NO '..' notion (objects
        # can have multiple parents), and libhdf5/h5py resolve '..' as
        # an ordinary link name that is absent — these two links must
        # DROP as dangling, never resolve against the traversal path
        return object_header([
            (0x06, soft_link_msg('up', '../base')),
            (0x06, soft_link_msg('updown', '../g/up')),
        ])
    probe = root(0, 0)
    ds_oh = root_oh + len(probe)
    ds_probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(0, 0))])
    grp_oh = ds_oh + len(ds_probe)
    data_addr = grp_oh + len(grp())
    eof = data_addr + len(data)
    out = superblock_dense(root_oh, eof)
    out += root(ds_oh, grp_oh)
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(data_addr, len(data)))])
    out += grp()
    out += data
    assert len(out) == eof
    return out

open('/root/repo/src/test/resources/h5/hand_soft_links.h5','wb').write(build_soft_links())
print("soft-link fixture written", len(build_soft_links()))

# ---------------- huge DIRECT heap object: dense links with a 17-byte
# heap ID — wide enough to embed address+length, so the huge link's
# bytes live at their own file address with no huge B-tree (§III.G
# "Huge Objects", directly-accessed form)

def build_huge_direct():
    root_oh = 96
    long_name = 'x' * 200          # link message ~212 B > max managed 64
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    FRHP_SIZE = 146
    fhdb_addr = frhp_addr + FRHP_SIZE
    block = 512
    bthd_addr = fhdb_addr + block
    BTHD_SIZE = 38
    btlf_addr = bthd_addr + BTHD_SIZE
    heap_id_len = 17               # 1 flag + 8 addr + 8 len
    rec_size = 4 + heap_id_len
    btlf_size = 512
    huge_addr = btlf_addr + btlf_size
    huge_bytes_probe = link_msg(long_name, 0)
    ds1_oh = huge_addr + len(huge_bytes_probe)
    ds_probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(0, 0))])
    ds2_oh = ds1_oh + len(ds_probe)
    d1_addr = ds2_oh + len(ds_probe)
    d2_addr = d1_addr + 24
    eof = d2_addr + 24

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    managed = link_msg('a', ds1_oh)
    huge_body = link_msg(long_name, ds2_oh)
    frhp = b'FRHP' + u8(0) + u16(heap_id_len) + u16(0) + u8(0)
    frhp += u32(64)                          # max managed object size
    frhp += u64(2) + u64(UNDEF)              # next huge id, huge btree (direct => none)
    frhp += u64(block - 17 - len(managed))   # free space
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(17 + len(managed))
    frhp += u64(1)                           # managed object count
    frhp += u64(len(huge_body)) + u64(1)     # huge size, huge count
    frhp += u64(0) + u64(0)                  # tiny size, count
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    managed_off = len(fhdb)
    fhdb += managed
    fhdb += b'\0' * (block - len(fhdb))
    out += fhdb

    bthd = b'BTHD' + u8(0) + u8(5) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(2) + u64(2)
    bthd += u32(lookup3(bthd))
    out += bthd

    def managed_id(off, ln):
        # 1 flag + 4 offset (maxHeapBits 32) + 12 length = 17
        return u8(0) + u32(off) + struct.pack('<Q', ln) + b'\0'*4
    def huge_direct_id(addr, ln):
        return u8(0x10) + u64(addr) + u64(ln)
    recs = sorted([(lookup3(b'a'), managed_id(managed_off, len(managed))),
                   (lookup3(long_name.encode()),
                    huge_direct_id(huge_addr, len(huge_body)))])
    btlf = b'BTLF' + u8(0) + u8(5)
    for h, hid in recs:
        assert len(hid) == heap_id_len
        btlf += u32(h) + hid
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    assert len(out) == huge_addr
    out += huge_body
    vals1 = [7.0, 8.0, 9.0]; vals2 = [40.0, 41.0, 42.0]
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(d1_addr, 24))])
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(d2_addr, 24))])
    out += b''.join(struct.pack('<d', v) for v in vals1)
    out += b''.join(struct.pack('<d', v) for v in vals2)
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_huge_direct.h5','wb').write(build_huge_direct())
print("huge-direct fixture written", len(build_huge_direct()))

# ---------------- tiny heap object: dense links with a 24-byte heap ID
# (> 18 → extended tiny form: 12-bit length-1 split across the flag
# byte's low nibble and the second ID byte; payload inline, §III.G
# "Tiny Objects")

def build_tiny_link():
    root_oh = 96
    root_probe = object_header([(0x02, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    FRHP_SIZE = 146
    fhdb_addr = frhp_addr + FRHP_SIZE
    block = 512
    bthd_addr = fhdb_addr + block
    btlf_addr = bthd_addr + 38
    heap_id_len = 24
    rec_size = 4 + heap_id_len
    btlf_size = 512
    ds1_oh = btlf_addr + btlf_size
    ds_probe = object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(0, 0))])
    ds2_oh = ds1_oh + len(ds_probe)
    d1_addr = ds2_oh + len(ds_probe)
    d2_addr = d1_addr + 24
    eof = d2_addr + 24

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x02, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    managed = link_msg('m', ds1_oh)
    tiny_body = link_msg('t', ds2_oh)        # 12 bytes, inline in the ID
    frhp = b'FRHP' + u8(0) + u16(heap_id_len) + u16(0) + u8(0)
    frhp += u32(64)
    frhp += u64(0) + u64(UNDEF)
    frhp += u64(block - 17 - len(managed))
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(17 + len(managed))
    frhp += u64(1)
    frhp += u64(0) + u64(0)                  # huge size, count
    frhp += u64(len(tiny_body)) + u64(1)     # tiny size, count
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u32(lookup3(frhp))
    assert len(frhp) == FRHP_SIZE
    out += frhp

    fhdb = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
    managed_off = len(fhdb)
    fhdb += managed
    fhdb += b'\0' * (block - len(fhdb))
    out += fhdb

    bthd = b'BTHD' + u8(0) + u8(5) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(2) + u64(2)
    bthd += u32(lookup3(bthd))
    out += bthd

    def managed_id(off, ln):
        # 1 flag + 4 offset + 19 length = 24
        return u8(0) + u32(off) + struct.pack('<Q', ln) + b'\0'*11
    def tiny_ext_id(body):
        n1 = len(body) - 1
        hid = u8(0x20 | ((n1 >> 8) & 0x0f)) + u8(n1 & 0xff) + body
        return hid + b'\0' * (heap_id_len - len(hid))
    recs = sorted([(lookup3(b'm'), managed_id(managed_off, len(managed))),
                   (lookup3(b't'), tiny_ext_id(tiny_body))])
    btlf = b'BTLF' + u8(0) + u8(5)
    for h, hid in recs:
        assert len(hid) == heap_id_len
        btlf += u32(h) + hid
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    vals1 = [5.5, 6.5, 7.5]; vals2 = [-1.0, -2.0, -3.0]
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(d1_addr, 24))])
    out += object_header([(0x01, dataspace([3])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(d2_addr, 24))])
    out += b''.join(struct.pack('<d', v) for v in vals1)
    out += b''.join(struct.pack('<d', v) for v in vals2)
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_tiny_link.h5','wb').write(build_tiny_link())
print("tiny-link fixture written", len(build_tiny_link()))

# ---------------- huge INDIRECT FILTERED heap object: dense root
# attributes in a deflate-filtered heap; one attribute exceeds the
# managed maximum and lives deflated at its own address, resolved
# through the heap's huge v2 B-tree (record type 2: address, stored
# length, filter mask, memory size, huge ID)

def attr_v3(name, dt, ds, data):
    nb = name.encode() + b'\0'
    return (u8(3) + u8(0) + u16(len(nb)) + u16(len(dt)) + u16(len(ds)) +
            u8(0) + nb + dt + ds + data)

def filter_msg_v2_deflate(level):
    # version 2, 1 filter, id 1 (deflate, no name for id<256), flags 0,
    # 1 client value
    return u8(2) + u8(1) + u16(1) + u16(0) + u16(1) + u32(level)

def build_huge_filtered():
    import zlib
    root_oh = 96
    block = 512
    filt = filter_msg_v2_deflate(6)
    frhp_size = 146 + 8 + 4 + len(filt)

    small1 = attr_v3('units', dt_str(2), dataspace([]), b'K\0')
    small2 = attr_v3('count', dt_f64(), dataspace([]), struct.pack('<d', 3.0))
    big_vals = [0.5 * i for i in range(300)]   # 2400 B payload > 512 max
    big = attr_v3('bigtable', dt_f64(), dataspace([300]),
                  b''.join(struct.pack('<d', v) for v in big_vals))

    fhdb_raw = b'FHDB' + u8(0) + u64(0) + u32(0)   # header addr patched below
    off1 = len(fhdb_raw); fhdb_raw += small1
    off2 = len(fhdb_raw); fhdb_raw += small2
    fhdb_raw += b'\0' * (block - len(fhdb_raw))

    root_probe = object_header([(0x15, u8(0)+u8(0)+u64(0)+u64(0))])
    frhp_addr = root_oh + len(root_probe)
    fhdb_addr = frhp_addr + frhp_size

    def patched_fhdb():
        raw = b'FHDB' + u8(0) + u64(frhp_addr) + u32(0)
        raw += small1 + small2
        raw += b'\0' * (block - len(raw))
        return raw
    fhdb_comp = zlib.compress(patched_fhdb(), 6)
    bthd_addr = fhdb_addr + len(fhdb_comp)
    rec_size = 17                     # heap ID(8) + flags(1) + corder(4) + hash(4)
    btlf_size = 512
    btlf_addr = bthd_addr + 38
    hugebt_addr = btlf_addr + btlf_size
    huge_rec_size = 8 + 8 + 4 + 8 + 8  # addr, stored len, mask, mem size, id
    hugebtlf_addr = hugebt_addr + 38
    hugebtlf_size = 512
    big_comp = zlib.compress(big, 6)
    big_addr = hugebtlf_addr + hugebtlf_size
    eof = big_addr + len(big_comp)

    out = superblock_dense(root_oh, eof)
    out += object_header([(0x15, u8(0)+u8(0)+u64(frhp_addr)+u64(bthd_addr))])

    frhp = b'FRHP' + u8(0) + u16(8) + u16(len(filt)) + u8(0)
    frhp += u32(block)                        # max managed object size
    frhp += u64(2) + u64(hugebt_addr)         # next huge id, huge btree
    frhp += u64(block - off2 - len(small2))
    frhp += u64(UNDEF)
    frhp += u64(block) + u64(block)
    frhp += u64(off2 + len(small2))
    frhp += u64(2)                            # managed count
    frhp += u64(len(big)) + u64(1)            # huge size, count
    frhp += u64(0) + u64(0)
    frhp += u16(4)
    frhp += u64(block) + u64(block)
    frhp += u16(32) + u16(1)
    frhp += u64(fhdb_addr) + u16(0)
    frhp += u64(len(fhdb_comp)) + u32(0)      # filtered root: stored size, mask
    frhp += filt
    frhp += u32(lookup3(frhp))
    assert len(frhp) == frhp_size, (len(frhp), frhp_size)
    out += frhp
    assert len(out) == fhdb_addr
    out += fhdb_comp

    def managed_attr_id(off, ln):
        # flag + 4 offset + 3 length = 8
        return u8(0) + u32(off) + struct.pack('<I', ln)[:3]
    def huge_attr_id(hid):
        return u8(0x10) + struct.pack('<Q', hid)[:7]
    names = [('units', managed_attr_id(off1, len(small1))),
             ('count', managed_attr_id(off2, len(small2))),
             ('bigtable', huge_attr_id(1))]
    bthd = b'BTHD' + u8(0) + u8(8) + u32(btlf_size) + u16(rec_size) + u16(0)
    bthd += u8(100) + u8(40) + u64(btlf_addr) + u16(3) + u64(3)
    bthd += u32(lookup3(bthd))
    out += bthd
    recs = sorted((lookup3(nm.encode()), hid) for nm, hid in names)
    btlf = b'BTLF' + u8(0) + u8(8)
    for h, hid in recs:
        assert len(hid) == 8
        btlf += hid + u8(0) + u32(0) + u32(h)
    btlf += u32(lookup3(btlf))
    btlf += b'\0' * (btlf_size - len(btlf))
    out += btlf

    hugebt = b'BTHD' + u8(0) + u8(2) + u32(hugebtlf_size) + u16(huge_rec_size) + u16(0)
    hugebt += u8(100) + u8(40) + u64(hugebtlf_addr) + u16(1) + u64(1)
    hugebt += u32(lookup3(hugebt))
    out += hugebt
    hugebtlf = b'BTLF' + u8(0) + u8(2)
    hugebtlf += u64(big_addr) + u64(len(big_comp)) + u32(0) + u64(len(big)) + u64(1)
    hugebtlf += u32(lookup3(hugebtlf))
    hugebtlf += b'\0' * (hugebtlf_size - len(hugebtlf))
    out += hugebtlf
    assert len(out) == big_addr
    out += big_comp
    assert len(out) == eof
    return out

open('/root/repo/src/test/resources/h5/hand_huge_filtered.h5','wb').write(build_huge_filtered())
print("huge-filtered fixture written", len(build_huge_filtered()))

# ---------------- compound-typed DATASETS (trajectory/profile in-situ
# shape): v3 compound datatype over packed records. File A: contiguous
# 'obs' — time f64 @0, lat f32 @8, lon f32 @12, qc i16 @16, name
# char[4] @18 (string member: reader must SKIP it, not abort), element
# size 22. File B: chunked 'prof' (depth f64 @0, temp f32 @8, size 12)
# behind shuffle+deflate — the full filter stack over compound
# elements, edge chunk clipped.
def dt_i16():
    # class 0 fixed v1; LE, signed (bit-field bit 3)
    return u8((1<<4)|0)+u8(0x08)+u8(0)+u8(0)+u32(2)+u16(0)+u16(16)

def dt_compound_v3(size, members):
    # members: (name, offset, dt_bytes); v3 names are unpadded
    # C-strings and the offset width is the minimum bytes that encode
    # `size` (1 byte for size < 256 — H5VM_limit_enc_size)
    n = len(members)
    assert size < 256
    b = u8((3<<4)|6)+u8(n & 0xff)+u8((n >> 8) & 0xff)+u8(0)+u32(size)
    for name, off, dtb in members:
        b += name.encode()+b'\0' + u8(off) + dtb
    return b

OBS_TIME = [1000.5, 1001.5, 1002.5, 1003.5, 1004.5]
OBS_LAT  = [10.0, 10.25, 10.5, 10.75, 11.0]
OBS_LON  = [-40.0, -40.5, -41.0, -41.5, -42.0]
OBS_QC   = [0, 1, -1, 2, 3]

def build_compound_contiguous():
    elems = b''
    for i in range(5):
        elems += struct.pack('<d', OBS_TIME[i]) + struct.pack('<f', OBS_LAT[i])
        elems += struct.pack('<f', OBS_LON[i]) + struct.pack('<h', OBS_QC[i])
        elems += ('st%d\0' % i).encode()
    assert len(elems) == 5 * 22
    dt = dt_compound_v3(22, [
        ('time', 0, dt_f64()), ('lat', 8, dt_f32()),
        ('lon', 12, dt_f32()), ('qc', 16, dt_i16()),
        ('name', 18, dt_str(4))])
    heap_data = pad8(b'\0'*8 + b'obs\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    attr = attr_v1('units', dt_str(8), dataspace([]), b'insitu\0\0')
    ds_probe = object_header([(0x01, dataspace([5])), (0x03, dt),
                              (0x08, layout_contiguous(0, 0)), (0x0C, attr)])
    data_addr = ds_oh_addr + len(ds_probe)
    eof = data_addr + len(elems)
    ds_oh = object_header([(0x01, dataspace([5])), (0x03, dt),
                           (0x08, layout_contiguous(data_addr, len(elems))),
                           (0x0C, attr)])
    assert len(ds_oh) == len(ds_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + elems
    assert len(out) == eof, (len(out), eof)
    return out

PROF_DEPTH = [0.0, 10.0, 20.0, 30.0, 40.0]
PROF_TEMP  = [20.5, 19.0, 17.25, 15.5, 13.75]

def filters_shuffle_deflate(elem, level):
    # pipeline order = application order: shuffle then deflate
    f = u8(1)+u8(2)+b'\0'*6
    f += u16(2)+u16(0)+u16(0)+u16(1)+u32(elem)+u32(0)   # shuffle
    f += u16(1)+u16(0)+u16(0)+u16(1)+u32(level)+u32(0)  # deflate
    return f

def build_compound_chunked():
    ELEM = 12
    def rec(i):
        # 6th element (edge-chunk fill) is never read back
        if i >= 5: return struct.pack('<d', 0.0) + struct.pack('<f', 0.0)
        return struct.pack('<d', PROF_DEPTH[i]) + struct.pack('<f', PROF_TEMP[i])
    chunks = []
    for ci in range(3):
        raw = rec(ci*2) + rec(ci*2+1)
        # shuffle: byte-transpose m elements of size ELEM
        m = len(raw)//ELEM
        shuf = bytes(raw[k*ELEM + j] for j in range(ELEM) for k in range(m))
        chunks.append(zlib.compress(shuf, 6))
    dt = dt_compound_v3(ELEM, [('depth', 0, dt_f64()), ('temp', 8, dt_f32())])
    heap_data = pad8(b'\0'*8 + b'prof\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    ds_probe = object_header([(0x01, dataspace([5])), (0x03, dt),
                              (0x0B, filters_shuffle_deflate(ELEM, 6)),
                              (0x08, layout_chunked(0, [2], ELEM))])
    chunk_bt_addr = ds_oh_addr + len(ds_probe)
    def chunk_key(size, off):
        return u32(size)+u32(0)+u64(off)+u64(0)
    node = b'TREE'+u8(1)+u8(0)+u16(3)+u64(UNDEF)+u64(UNDEF)
    node_len = (len(node) + 3*(len(chunk_key(0,0))+8) + len(chunk_key(0,0)) + 7)//8*8
    data_addr = chunk_bt_addr + node_len
    addrs = []
    a = data_addr
    for c in chunks:
        addrs.append(a); a += (len(c)+7)//8*8
    eof = a
    for ci, (c, ad) in enumerate(zip(chunks, addrs)):
        node += chunk_key(len(c), ci*2)+u64(ad)
    node += chunk_key(0, 6)
    node += b'\0'*(node_len - len(node) + len(b'TREE')*0)
    node = node[:node_len]
    ds_oh = object_header([(0x01, dataspace([5])), (0x03, dt),
                           (0x0B, filters_shuffle_deflate(ELEM, 6)),
                           (0x08, layout_chunked(chunk_bt_addr, [2], ELEM))])
    assert len(ds_oh) == len(ds_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + node
    for c in chunks:
        out += c + b'\0'*(((len(c)+7)//8*8) - len(c))
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_compound.h5','wb').write(build_compound_contiguous())
open('/root/repo/src/test/resources/h5/hand_compound_chunked.h5','wb').write(build_compound_chunked())
print("compound fixtures written", len(build_compound_contiguous()),
      len(build_compound_chunked()))

# ---------------- fletcher32 over the REAL archive filter stack
# (shuffle -> deflate -> fletcher32), checksum computed by an
# INDEPENDENT python implementation of the public H5checksum.c
# algorithm: 16-bit big-endian words, 360-word partial reductions, odd
# tail byte padded high, two final folds; stored little-endian after
# the compressed payload.
def fletcher32_h5(data):
    sum1 = 0; sum2 = 0
    i = 0
    remaining = len(data) // 2
    while remaining > 0:
        tlen = min(remaining, 360)
        remaining -= tlen
        for _ in range(tlen):
            sum1 += (data[i] << 8) | data[i+1]
            i += 2
            sum2 += sum1
        sum1 = (sum1 & 0xffff) + (sum1 >> 16)
        sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xffff) + (sum1 >> 16)
        sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    return ((sum2 << 16) | sum1) & 0xffffffff

def filters_shuffle_deflate_fletcher(elem, level):
    f = u8(1)+u8(3)+b'\0'*6
    f += u16(2)+u16(0)+u16(0)+u16(1)+u32(elem)+u32(0)   # shuffle
    f += u16(1)+u16(0)+u16(0)+u16(1)+u32(level)+u32(0)  # deflate
    f += u16(3)+u16(0)+u16(0)+u16(0)                    # fletcher32
    return f

FLW_VALS = [100.25, -3.5, 7.75, 2024.0, -0.125, 55.5]

def build_fletcher_chunked():
    ELEM = 4
    chunks = []
    for ci in range(3):
        raw = b''.join(struct.pack('<f', v) for v in FLW_VALS[ci*2:(ci+1)*2])
        m = len(raw)//ELEM
        shuf = bytes(raw[k*ELEM + j] for j in range(ELEM) for k in range(m))
        comp = zlib.compress(shuf, 6)
        chunks.append(comp + u32(fletcher32_h5(comp)))
    heap_data = pad8(b'\0'*8 + b'w\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    ds_probe = object_header([(0x01, dataspace([6])), (0x03, dt_f32()),
                              (0x0B, filters_shuffle_deflate_fletcher(ELEM, 6)),
                              (0x08, layout_chunked(0, [2], ELEM))])
    chunk_bt_addr = ds_oh_addr + len(ds_probe)
    def chunk_key(size, off):
        return u32(size)+u32(0)+u64(off)+u64(0)
    node = b'TREE'+u8(1)+u8(0)+u16(3)+u64(UNDEF)+u64(UNDEF)
    node_len = (len(node) + 3*(len(chunk_key(0,0))+8) + len(chunk_key(0,0)) + 7)//8*8
    data_addr = chunk_bt_addr + node_len
    addrs = []
    a = data_addr
    for c in chunks:
        addrs.append(a); a += (len(c)+7)//8*8
    eof = a
    for ci, (c, ad) in enumerate(zip(chunks, addrs)):
        node += chunk_key(len(c), ci*2)+u64(ad)
    node += chunk_key(0, 6)
    node += b'\0'*(node_len - len(node))
    ds_oh = object_header([(0x01, dataspace([6])), (0x03, dt_f32()),
                           (0x0B, filters_shuffle_deflate_fletcher(ELEM, 6)),
                           (0x08, layout_chunked(chunk_bt_addr, [2], ELEM))])
    assert len(ds_oh) == len(ds_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + node
    for c in chunks:
        out += c + b'\0'*(((len(c)+7)//8*8) - len(c))
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_fletcher.h5','wb').write(build_fletcher_chunked())
print("fletcher32 fixture written", len(build_fletcher_chunked()))

# ---------------- 2-D compound dataset: exercises projection pushdown
# against member-qualified names (a multi-dim dataset is kept only if
# keep() matches the dataset OR one of its `<ds>.<member>` columns)
def build_compound_2d():
    elems = b''
    for i in range(6):
        elems += struct.pack('<f', 10.0 + i) + struct.pack('<f', -5.0 - i)
    dt = dt_compound_v3(8, [('a', 0, dt_f32()), ('b', 4, dt_f32())])
    heap_data = pad8(b'\0'*8 + b'grid\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    ds_probe = object_header([(0x01, dataspace([2,3])), (0x03, dt),
                              (0x08, layout_contiguous(0, 0))])
    data_addr = ds_oh_addr + len(ds_probe)
    eof = data_addr + len(elems)
    ds_oh = object_header([(0x01, dataspace([2,3])), (0x03, dt),
                           (0x08, layout_contiguous(data_addr, len(elems)))])
    assert len(ds_oh) == len(ds_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + elems
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_compound_2d.h5','wb').write(build_compound_2d())
print("2-D compound fixture written", len(build_compound_2d()))

# ---------------- szip (CCSDS 121.0 extended-Rice) fixture, encoded by
# an INDEPENDENT python implementation of the standard's coded-stream
# layout: NN preprocessing with reference-sample insertion, blocks of J
# samples, per-block option (zero-run / k-split / no-compression)
# chosen by THIS encoder's own cost rule — deliberately not mirroring
# the Scala encoder's choices (it never emits the 2nd-extension
# option), so the Scala DECODER is exercised against spec-valid bytes
# it did not produce. HDF5 framing per H5Zszip.c: chunk = u32 LE
# uncompressed byte count + raw bitstream; filter client values
# [options_mask, bits_per_pixel, pixels_per_block, pixels_per_scanline].
class BitW:
    def __init__(self): self.bits = []
    def put(self, v, w):
        for i in range(w-1, -1, -1): self.bits.append((v >> i) & 1)
    def fs(self, v): self.bits.extend([0]*v + [1])
    def bytes(self):
        bs = bytearray()
        for i in range(0, len(self.bits), 8):
            chunk = self.bits[i:i+8] + [0]*(8 - len(self.bits[i:i+8]))
            bs.append(int(''.join(map(str, chunk)), 2))
        return bytes(bs)

def szip_map_delta(x, pred, xmax):
    theta = min(pred, xmax - pred)
    d = x - pred
    if 0 <= d <= theta: return 2*d
    if d < 0 and -d <= theta: return -2*d - 1
    return theta + abs(d)

def szip_compress(samples, n, J, ppsl):
    xmax = (1 << n) - 1
    id_bits = 3 if n <= 8 else (4 if n <= 16 else 5)
    max_id = (1 << id_bits) - 1
    w = BitW()
    for s0 in range(0, len(samples), ppsl):
        line = samples[s0:s0+ppsl]
        ref = line[0]
        deltas = [0] + [szip_map_delta(line[t], line[t-1], xmax)
                        for t in range(1, len(line))]
        nblocks = (len(deltas) + J - 1)//J
        deltas += [0]*(nblocks*J - len(deltas))
        b = 0
        while b < nblocks:
            off = b*J
            blk = deltas[off:off+J]
            has_ref = (b == 0)
            t0 = 1 if has_ref else 0
            if all(v == 0 for v in blk):
                run = 1
                while b + run < nblocks and \
                      all(v == 0 for v in deltas[(b+run)*J:(b+run+1)*J]):
                    run += 1
                w.put(0, id_bits + 1)
                if has_ref: w.put(ref, n)
                if b + run == nblocks: w.fs(4)       # remainder of segment
                elif run <= 4: w.fs(run - 1)
                else: w.fs(run)
                b += run
                continue
            coded = J - t0
            # this encoder's own rule: best k by exact cost, else raw
            best_k, best_cost = 0, None
            for k in range(0, min(max_id - 2, n - 1) + 1):
                c = id_bits + (k + 1)*coded + sum(v >> k for v in blk[t0:])
                if best_cost is None or c < best_cost:
                    best_k, best_cost = k, c
            raw_cost = id_bits + n*coded
            if raw_cost <= best_cost:
                w.put(max_id, id_bits)
                if has_ref: w.put(ref, n)
                for v in blk[t0:]: w.put(v, n)
            else:
                w.put(best_k + 1, id_bits)
                if has_ref: w.put(ref, n)
                for v in blk[t0:]: w.fs(v >> best_k)
                if best_k:
                    for v in blk[t0:]: w.put(v & ((1 << best_k) - 1), best_k)
            b += 1
    return w.bytes()

SZIP_VALS = ([100 + 3*i for i in range(16)] +   # ramp chunk: k-split
             [500]*16)                           # flat chunk: zero-runs

def filters_szip(mask, bpp, ppb, ppsl):
    return (u8(1)+u8(1)+b'\0'*6 +
            u16(4)+u16(0)+u16(0)+u16(4)+u32(mask)+u32(bpp)+u32(ppb)+u32(ppsl))

def dt_i16u():
    # unsigned 16-bit LE (szip codes n-bit unsigned samples)
    return u8((1<<4)|0)+u8(0x00)+u8(0)+u8(0)+u32(2)+u16(0)+u16(16)

def build_szip():
    MASK = 1 | 8 | 32 | 128   # AllowK13 | LSB | NN | Raw
    BPP, PPB, PPSL = 16, 8, 16
    chunks = []
    for ci in range(2):
        vals = SZIP_VALS[ci*16:(ci+1)*16]
        raw_len = len(vals)*2
        body = szip_compress(vals, BPP, PPB, PPSL)
        chunks.append(struct.pack('<I', raw_len) + body)
    heap_data = pad8(b'\0'*8 + b'z\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    ds_probe = object_header([(0x01, dataspace([32])), (0x03, dt_i16u()),
                              (0x0B, filters_szip(MASK, BPP, PPB, PPSL)),
                              (0x08, layout_chunked(0, [16], 2))])
    chunk_bt_addr = ds_oh_addr + len(ds_probe)
    def chunk_key(size, off):
        return u32(size)+u32(0)+u64(off)+u64(0)
    node = b'TREE'+u8(1)+u8(0)+u16(2)+u64(UNDEF)+u64(UNDEF)
    node_len = (len(node) + 2*(len(chunk_key(0,0))+8) + len(chunk_key(0,0)) + 7)//8*8
    data_addr = chunk_bt_addr + node_len
    addrs = []
    a = data_addr
    for c in chunks:
        addrs.append(a); a += (len(c)+7)//8*8
    eof = a
    for ci, (c, ad) in enumerate(zip(chunks, addrs)):
        node += chunk_key(len(c), ci*16)+u64(ad)
    node += chunk_key(0, 32)
    node += b'\0'*(node_len - len(node))
    ds_oh = object_header([(0x01, dataspace([32])), (0x03, dt_i16u()),
                           (0x0B, filters_szip(MASK, BPP, PPB, PPSL)),
                           (0x08, layout_chunked(chunk_bt_addr, [16], 2))])
    assert len(ds_oh) == len(ds_probe)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + node
    for c in chunks:
        out += c + b'\0'*(((len(c)+7)//8*8) - len(c))
    assert len(out) == eof, (len(out), eof)
    return out

open('/root/repo/src/test/resources/h5/hand_szip.h5','wb').write(build_szip())
print("szip fixture written", len(build_szip()))

# ---------------- external (cross-file) links: root carries one local
# dataset, an external link into hand_contiguous.h5's /temp, and an
# external link to a missing file (must drop like h5py)
def ext_link_msg(name, file, objpath):
    nb = name.encode()
    payload = u8(0) + file.encode() + b'\0' + objpath.encode() + b'\0'
    return u8(1) + u8(0x08) + u8(64) + u8(len(nb)) + nb + u16(len(payload)) + payload

def build_external_links():
    root_oh = 96
    vals = [7.0, 8.0]
    data = b''.join(struct.pack('<d', v) for v in vals)
    def root(ds_oh):
        return object_header([
            (0x06, link_msg('local', ds_oh)),
            (0x06, ext_link_msg('ext_temp', 'hand_contiguous.h5', '/temp')),
            (0x06, ext_link_msg('gone', 'missing.h5', '/x')),
        ])
    probe = root(0)
    ds_oh = root_oh + len(probe)
    ds_probe = object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                              (0x08, layout_contiguous(0, 0))])
    data_addr = ds_oh + len(ds_probe)
    eof = data_addr + len(data)
    out = superblock_dense(root_oh, eof)
    out += root(ds_oh)
    out += object_header([(0x01, dataspace([2])), (0x03, dt_f64()),
                          (0x08, layout_contiguous(data_addr, len(data)))])
    out += data
    assert len(out) == eof
    return out

open('/root/repo/src/test/resources/h5/hand_external.h5','wb').write(build_external_links())
print("external-link fixture written", len(build_external_links()))

# ---------------- version-4 data layouts (HDF5 1.10+ / libver-LATEST
# writers): single-chunk, implicit, and fixed-array chunk indexes —
# the shapes modern libnetcdf emits for fixed-dims chunked data.
# Hand-assembled per format spec III.H (FAHD/FADB) and the v4 layout
# message; the classic group scaffolding carries them (message parsing
# is independent of superblock/OH version).
def layout_v4_single(addr, chunk_dims, elem, filtered_size=None, mask=0):
    flags = 0x2 if filtered_size is not None else 0
    dims = chunk_dims + [elem]
    b = u8(4)+u8(2)+u8(flags)+u8(len(dims))+u8(4)
    for d in dims: b += u32(d)
    b += u8(1)  # single chunk index
    if filtered_size is not None:
        b += u64(filtered_size) + u32(mask)
    b += u64(addr)
    return b

def layout_v4_implicit(addr, chunk_dims, elem):
    dims = chunk_dims + [elem]
    b = u8(4)+u8(2)+u8(0)+u8(len(dims))+u8(4)
    for d in dims: b += u32(d)
    b += u8(2) + u64(addr)
    return b

def layout_v4_fixedarray(addr, chunk_dims, elem, page_bits):
    dims = chunk_dims + [elem]
    b = u8(4)+u8(2)+u8(0)+u8(len(dims))+u8(4)
    for d in dims: b += u32(d)
    b += u8(3) + u8(page_bits) + u64(addr)
    return b

def v4_scaffold(ds_name, ds_msgs_of):
    """Classic sb0 + symbol-table root carrying ONE dataset whose
    messages are ds_msgs_of(tail_addr) -> (msgs, tail_bytes); the tail
    (index structures + chunk data) lands after the dataset OH."""
    heap_data = pad8(b'\0'*8 + ds_name.encode() + b'\0')
    name_off = 8
    root_oh = 96
    root_probe = object_header([(0x11, u64(0)+u64(0))])
    btree_addr = root_oh + len(root_probe)
    bt_probe = pad8(group_btree([name_off], [0], name_off))
    snod_addr = btree_addr + len(bt_probe)
    sn_probe = pad8(snod([(name_off, 0)]))
    heap_hdr_addr = snod_addr + len(sn_probe)
    heap_data_addr = heap_hdr_addr + 32
    ds_oh_addr = heap_data_addr + len(heap_data)
    probe_msgs, _ = ds_msgs_of(0)
    ds_probe = object_header(probe_msgs)
    tail_addr = ds_oh_addr + len(ds_probe)
    msgs, tail = ds_msgs_of(tail_addr)
    ds_oh = object_header(msgs)
    assert len(ds_oh) == len(ds_probe)
    eof = tail_addr + len(tail)
    root = object_header([(0x11, u64(btree_addr)+u64(heap_hdr_addr))])
    bt = pad8(group_btree([name_off], [snod_addr], name_off))
    sn = pad8(snod([(name_off, ds_oh_addr)]))
    hh, hd = heap(heap_data_addr, heap_data)
    out = superblock(root_oh, eof, btree_addr, heap_hdr_addr)
    out += root + bt + sn + hh + hd + ds_oh + tail
    assert len(out) == eof, (len(out), eof)
    return out

V4_SINGLE_VALS = [3.5*i - 7.0 for i in range(12)]     # f32[3,4], one chunk
V4_IMPL_VALS   = [2.0*i + 0.5 for i in range(10)]     # f64[10], chunks [4]
V4_FA_VALS     = [float((7*i) % 23) for i in range(20)]  # f32[20], chunks [3]

def build_v4_single():
    raw = b''.join(struct.pack('<f', v) for v in V4_SINGLE_VALS)
    comp = zlib.compress(raw, 6)
    def msgs(tail_addr):
        return ([(0x01, dataspace([3,4])), (0x03, dt_f32()),
                 (0x0B, filters_deflate(6)),
                 (0x08, layout_v4_single(tail_addr, [3,4], 4,
                                         filtered_size=len(comp)))], comp)
    return v4_scaffold('sc', msgs)

def build_v4_implicit():
    # 3 chunks of 4 f64 each, packed back-to-back; last chunk half-used
    def chunk(ci):
        vals = (V4_IMPL_VALS + [0.0, 0.0])[ci*4:(ci+1)*4]
        return b''.join(struct.pack('<d', v) for v in vals)
    tail_data = b''.join(chunk(ci) for ci in range(3))
    def msgs(tail_addr):
        return ([(0x01, dataspace([10])), (0x03, dt_f64()),
                 (0x08, layout_v4_implicit(tail_addr, [4], 8))], tail_data)
    return v4_scaffold('im', msgs)

def build_v4_fixedarray(page_bits, fname):
    # 7 chunks of 3 f32 (last partial), shuffle+deflate filtered;
    # page_bits=8 -> one inline block, page_bits=2 -> paged (2 pages)
    chunks = []
    for ci in range(7):
        vals = (V4_FA_VALS + [0.0, 0.0])[ci*3:(ci+1)*3]
        raw = b''.join(struct.pack('<f', v) for v in vals)
        m = len(raw)//4
        shuf = bytes(raw[k*4 + j] for j in range(4) for k in range(m))
        chunks.append(zlib.compress(shuf, 6))
    ENTRY = 8 + 4 + 4   # addr + size(4B) + mask
    def msgs(tail_addr):
        fahd_addr = tail_addr
        fadb_addr = fahd_addr + 4+1+1+1+1+8+8+4
        nelmts = 7
        page = 1 << page_bits
        if nelmts <= page:
            body_len = 4+1+1+8 + nelmts*ENTRY + 4
        else:
            npages = (nelmts + page - 1)//page
            body_len = 4+1+1+8 + (npages+7)//8 + 4
            rem = nelmts
            for p in range(npages):
                inp = min(page, rem); rem -= inp
                body_len += inp*ENTRY + 4
        data_addr = fadb_addr + body_len
        addrs = []
        a = data_addr
        for c in chunks:
            addrs.append(a); a += len(c)
        fahd = b'FAHD'+u8(0)+u8(1)+u8(ENTRY)+u8(page_bits)+u64(nelmts)+u64(fadb_addr)
        fahd += u32(lookup3(fahd))
        def entry(ci):
            return u64(addrs[ci]) + u32(len(chunks[ci])) + u32(0)
        fadb = b'FADB'+u8(0)+u8(1)+u64(fahd_addr)
        if nelmts <= page:
            for ci in range(nelmts): fadb += entry(ci)
            fadb += u32(lookup3(fadb))
        else:
            npages = (nelmts + page - 1)//page
            fadb += b'\xff' * ((npages+7)//8)   # all pages initialized
            fadb += u32(lookup3(fadb))
            ci = 0
            for p in range(npages):
                pg = b''
                for _ in range(min(page, nelmts - ci)):
                    pg += entry(ci); ci += 1
                fadb += pg + u32(lookup3(pg))
        tail = fahd + fadb + b''.join(chunks)
        assert len(fahd) == fadb_addr - fahd_addr
        assert fadb_addr + len(fadb) == data_addr, (len(fadb), body_len)
        return ([(0x01, dataspace([20])), (0x03, dt_f32()),
                 (0x0B, filters_shuffle_deflate(4, 6)),
                 (0x08, layout_v4_fixedarray(fahd_addr, [3], 4, page_bits))],
                tail)
    out = v4_scaffold('fa', msgs)
    open(fname,'wb').write(out)
    return out

open('/root/repo/src/test/resources/h5/hand_v4_single.h5','wb').write(build_v4_single())
open('/root/repo/src/test/resources/h5/hand_v4_implicit.h5','wb').write(build_v4_implicit())
build_v4_fixedarray(8, '/root/repo/src/test/resources/h5/hand_v4_fixedarray.h5')
build_v4_fixedarray(2, '/root/repo/src/test/resources/h5/hand_v4_fa_paged.h5')
print("v4 layout fixtures written",
      len(build_v4_single()), len(build_v4_implicit()))

# ---------------- v4 layout with a v2-B-TREE chunk index (type 5,
# record type 11: filtered chunks keyed by scaled offsets) — the index
# libhdf5 uses for datasets with >1 unlimited dimension
def layout_v4_btree(addr, chunk_dims, elem, node_size):
    dims = chunk_dims + [elem]
    b = u8(4)+u8(2)+u8(0)+u8(len(dims))+u8(4)
    for d in dims: b += u32(d)
    b += u8(5) + u32(node_size) + u8(100) + u8(40) + u64(addr)
    return b

V4_BT_VALS = [float((11*i) % 29) for i in range(24)]  # f32[4,6], chunks [2,3]

def build_v4_btree():
    W, H = 6, 4
    CW, CH = 3, 2
    chunks = []   # (cy, cx, bytes)
    for cy in range(2):
        for cx in range(2):
            raw = b''
            for dy in range(CH):
                for dx in range(CW):
                    v = V4_BT_VALS[(cy*CH+dy)*W + (cx*CW+dx)]
                    raw += struct.pack('<f', v)
            m = len(raw)//4
            shuf = bytes(raw[k*4 + j] for j in range(4) for k in range(m))
            chunks.append((cy, cx, zlib.compress(shuf, 6)))
    REC = 8 + 4 + 4 + 8*2   # addr + size(4) + mask + scaled offsets
    NODE = 168
    def msgs(tail_addr):
        bthd_addr = tail_addr
        btlf_addr = bthd_addr + 4+1+1+4+2+2+1+1+8+2+8+4
        data_addr = btlf_addr + NODE
        addrs = []
        a = data_addr
        for (_, _, c) in chunks:
            addrs.append(a); a += len(c)
        bthd = b'BTHD'+u8(0)+u8(11)+u32(NODE)+u16(REC)+u16(0)
        bthd += u8(100)+u8(40)+u64(btlf_addr)+u16(len(chunks))+u64(len(chunks))
        bthd += u32(lookup3(bthd))
        btlf = b'BTLF'+u8(0)+u8(11)
        for (cy, cx, c), ad in zip(chunks, addrs):
            btlf += u64(ad) + u32(len(c)) + u32(0) + u64(cy) + u64(cx)
        btlf += u32(lookup3(btlf))
        btlf += b'\0' * (NODE - len(btlf))
        assert len(btlf) == NODE
        tail = bthd + btlf + b''.join(c for (_, _, c) in chunks)
        return ([(0x01, dataspace([H, W])), (0x03, dt_f32()),
                 (0x0B, filters_shuffle_deflate(4, 6)),
                 (0x08, layout_v4_btree(bthd_addr, [CH, CW], 4, NODE))],
                tail)
    return v4_scaffold('bt', msgs)

open('/root/repo/src/test/resources/h5/hand_v4_btree.h5','wb').write(build_v4_btree())
print("v4 btree fixture written", len(build_v4_btree()))

# ---------------- paged fixed array with an UNINITIALIZED page.
# Real HDF5 (H5FAdblock.c) allocates EVERY page slot when the data
# block is created and addresses pages arithmetically:
#   page p at pages_base + p * (page_nelmts*entry_size + 4)
# with full stride even for the truncated last page. A clear bitmap
# bit means the page was never WRITTEN (its chunks are fill), but its
# slot still occupies the full stride on disk. The fixture puts the
# CLEAR page FIRST (page 0 garbage slack, page 1 initialized) so a
# reader that treats a clear page as zero on-disk bytes parses page 1
# from page 0's slack and fails — the shape that discriminates.
def build_v4_fa_sparse():
    page_bits = 2      # 4 entries/page; 7 chunks -> 2 pages
    chunks = []        # only page 1's chunks (ci 4..6) exist
    for ci in range(4, 7):
        vals = (V4_FA_VALS + [0.0, 0.0])[ci*3:(ci+1)*3]
        raw = b''.join(struct.pack('<f', v) for v in vals)
        m = len(raw)//4
        shuf = bytes(raw[k*4 + j] for j in range(4) for k in range(m))
        chunks.append(zlib.compress(shuf, 6))
    ENTRY = 8 + 4 + 4
    PAGE_STRIDE = 4*ENTRY + 4          # full page: 4 entries + checksum
    def msgs(tail_addr):
        fahd_addr = tail_addr
        fadb_addr = fahd_addr + 4+1+1+1+1+8+8+4
        nelmts = 7
        # body: sig+ver+cid+hdr + bitmap(1) + checksum + BOTH page
        # slots at full stride (page 1's image is 3 entries + checksum
        # = 52 bytes inside its 68-byte slot; the rest is alloc slack)
        body_len = 4+1+1+8 + 1 + 4 + 2*PAGE_STRIDE
        data_addr = fadb_addr + body_len
        addrs = []
        a = data_addr
        for c in chunks:
            addrs.append(a); a += len(c)
        fahd = b'FAHD'+u8(0)+u8(1)+u8(ENTRY)+u8(page_bits)+u64(nelmts)+u64(fadb_addr)
        fahd += u32(lookup3(fahd))
        fadb = b'FADB'+u8(0)+u8(1)+u64(fahd_addr)
        fadb += u8(0b10)            # page 0 NOT initialized, page 1 is
        fadb += u32(lookup3(fadb))
        fadb += b'\xa5' * PAGE_STRIDE   # page 0 slot: allocated, unwritten
        pg = b''
        for k in range(3):              # last page truncated: 3 entries
            pg += u64(addrs[k]) + u32(len(chunks[k])) + u32(0)
        fadb += pg + u32(lookup3(pg))
        fadb += b'\xa5' * (PAGE_STRIDE - len(pg) - 4)  # page 1 slot slack
        tail = fahd + fadb + b''.join(chunks)
        assert fadb_addr + len(fadb) == data_addr
        return ([(0x01, dataspace([20])), (0x03, dt_f32()),
                 (0x0B, filters_shuffle_deflate(4, 6)),
                 (0x08, layout_v4_fixedarray(fahd_addr, [3], 4, page_bits))],
                tail)
    return v4_scaffold('fs', msgs)

open('/root/repo/src/test/resources/h5/hand_v4_fa_sparse.h5','wb').write(build_v4_fa_sparse())
print("sparse paged FA fixture written", len(build_v4_fa_sparse()))

# ---------------- external link to the target ROOT ('/') — the most
# common external-link form; grafted names must keep their separator
def build_external_root():
    root_oh = 96
    def root():
        return object_header([
            (0x06, ext_link_msg('root_lnk', 'hand_contiguous.h5', '/')),
        ])
    out = superblock_dense(root_oh, len(superblock_dense(root_oh, 0)) and 0 or 0)
    body = root()
    eof = root_oh + len(body)
    out = superblock_dense(root_oh, eof)
    out += body
    assert len(out) == eof
    return out

open('/root/repo/src/test/resources/h5/hand_external_root.h5','wb').write(build_external_root())

# ---------------- allocation-bomb fixture: a compound datatype with
# 300 members over a 2^20-element dataspace. Element count (2^20) and
# per-member size are individually modest, but members x elements =
# 3.1e8 doubles (2.5 GiB) — a reader that bounds only the element
# count allocates it all before touching storage. The layout address
# is UNDEF so a correct reader refuses BEFORE any data is read.
def build_compound_bomb():
    nmem = 300
    dt = dt_compound_v3(4, [('m%d' % i, 0, dt_f32()) for i in range(nmem)])
    def msgs(tail_addr):
        return ([(0x01, dataspace([1 << 20])), (0x03, dt),
                 (0x08, layout_contiguous(UNDEF, 0))], b'')
    return v4_scaffold('bm', msgs)

open('/root/repo/src/test/resources/h5/hand_compound_bomb.h5','wb').write(build_compound_bomb())
print("compound bomb fixture written", len(build_compound_bomb()))

# ---------------- contiguous stride-bomb: ONE member but a 4100-byte
# element over 2^20 elements. n (2^20) and members (1) each pass their
# envelopes; only n x elem_size (4.3 GB, wrapping a 32-bit product to
# ~4 MB) is absurd — the refusal must come from the Long extent bound
# on the contiguous read, not from an uncontrolled mid-decode index
# error after a wrapped take().
def dt_compound_v3_wide(size, members):
    # same as dt_compound_v3 but 2-byte member offsets (the v3 width
    # for 256 <= size < 65536, H5VM_limit_enc_size)
    n = len(members)
    assert 256 <= size < 65536
    b = u8((3<<4)|6)+u8(n & 0xff)+u8((n >> 8) & 0xff)+u8(0)+u32(size)
    for name, off, dtb in members:
        b += name.encode()+b'\0' + u8(off & 0xff) + u8((off >> 8) & 0xff) + dtb
    return b

def build_compound_stride():
    dt = dt_compound_v3_wide(4100, [('a', 0, dt_f32())])
    def msgs(tail_addr):
        # a VALID in-file address: the extent bound, not the address
        # check, must be what refuses
        return ([(0x01, dataspace([1 << 20])), (0x03, dt),
                 (0x08, layout_contiguous(96, 0))], b'')
    return v4_scaffold('st', msgs)

open('/root/repo/src/test/resources/h5/hand_compound_stride.h5','wb').write(build_compound_stride())
print("compound stride fixture written", len(build_compound_stride()))
print("root external-link fixture written", len(build_external_root()))

# ---------------- parameterized sparse-paged fixed arrays: a sweep of
# initialized-page patterns (clear-first / clear-middle / clear-last /
# all-clear / alternating / all-init) over page sizes, all with full
# arithmetic page strides per H5FAdblock.c. The single hand fixture
# above caught the r8 page-addressing fix; this sweep pins the
# addressing for every pattern class so a future regression cannot
# hide behind one layout.
def build_v4_fa_pattern(page_bits, nchunks, init_pages, tag, fname):
    page = 1 << page_bits
    assert nchunks > page, "paged form requires nelmts > page"
    npages = (nchunks + page - 1)//page
    chunks = {}
    for ci in range(nchunks):
        if ci // page in init_pages:
            vals = [float((7*(ci*3+j)) % 23) for j in range(3)]
            raw = b''.join(struct.pack('<f', v) for v in vals)
            m = len(raw)//4
            shuf = bytes(raw[k*4 + j] for j in range(4) for k in range(m))
            chunks[ci] = zlib.compress(shuf, 6)
    ENTRY = 16
    STRIDE = page*ENTRY + 4
    def msgs(tail_addr):
        fahd_addr = tail_addr
        fadb_addr = fahd_addr + 4+1+1+1+1+8+8+4
        nelmts = nchunks
        bitmap_len = (npages+7)//8
        body_len = 4+1+1+8 + bitmap_len + 4 + npages*STRIDE
        data_addr = fadb_addr + body_len
        addrs = {}
        a = data_addr
        for ci in sorted(chunks):
            addrs[ci] = a; a += len(chunks[ci])
        fahd = b'FAHD'+u8(0)+u8(1)+u8(ENTRY)+u8(page_bits)+u64(nelmts)+u64(fadb_addr)
        fahd += u32(lookup3(fahd))
        fadb = b'FADB'+u8(0)+u8(1)+u64(fahd_addr)
        bm = bytearray(bitmap_len)
        for p in init_pages: bm[p//8] |= (1 << (p % 8))
        fadb += bytes(bm)
        fadb += u32(lookup3(fadb))
        for p in range(npages):
            inp = min(page, nelmts - p*page)
            if p in init_pages:
                pg = b''
                for k in range(inp):
                    ci = p*page + k
                    pg += u64(addrs[ci]) + u32(len(chunks[ci])) + u32(0)
                fadb += pg + u32(lookup3(pg))
                fadb += b'\xa5' * (STRIDE - len(pg) - 4)
            else:
                fadb += b'\xa5' * STRIDE   # allocated, never written
        tail = fahd + fadb + b''.join(chunks[ci] for ci in sorted(chunks))
        assert fadb_addr + len(fadb) == data_addr
        return ([(0x01, dataspace([nchunks*3])), (0x03, dt_f32()),
                 (0x0B, filters_shuffle_deflate(4, 6)),
                 (0x08, layout_v4_fixedarray(fahd_addr, [3], 4, page_bits))],
                tail)
    out = v4_scaffold(tag, msgs)
    open(fname, 'wb').write(out)
    return out

FA_PATTERNS = [
    (2, 10, {1, 2}, 'q0'),       # clear FIRST page
    (2, 10, {0, 2}, 'q1'),       # clear MIDDLE page
    (2, 10, {0, 1}, 'q2'),       # clear LAST (truncated) page
    (2, 10, set(), 'q3'),        # ALL pages clear
    (1, 9, {0, 2, 4}, 'q4'),     # alternating over 5 two-entry pages
    (2, 16, {0, 1, 2, 3}, 'q5'), # all init, exact page boundary
]
for pb, n, init, tag in FA_PATTERNS:
    build_v4_fa_pattern(pb, n, init, tag,
        f'/root/repo/src/test/resources/h5/hand_v4_fa_{tag}.h5')
print("sparse paged FA pattern sweep written:",
      [t for _, _, _, t in FA_PATTERNS])
