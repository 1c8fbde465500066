#!/usr/bin/env python3
"""Minimal-but-valid ISO BMFF (MP4) fixture, hand-assembled from the
public ISO/IEC 14496-12 box layouts — an independent second
implementation so graft's Mp4 parser validates against spec-derived
bytes, not a round-trip of itself.

Layout: ftyp | mdat (6 video samples with known bytes, 2 chunks of 3)
| moov (mvhd + one video trak: tkhd, mdhd, hdlr, minf/stbl with
stsd(avc1)/stts/stsc/stsz/stco).
"""
import struct

def u32(v): return struct.pack('>I', v)
def u16(v): return struct.pack('>H', v)

def box(tpe, payload):
    return u32(8 + len(payload)) + tpe.encode('ascii') + payload

def full(tpe, version, flags, payload):
    return box(tpe, bytes([version]) + flags.to_bytes(3, 'big') + payload)

# 6 samples: sizes 3..8, recognizable content
samples = [bytes([0xA0 + i] * (3 + i)) for i in range(6)]
sizes = [len(s) for s in samples]

ftyp = box('ftyp', b'isom' + u32(0x200) + b'isomavc1')
mdat_payload = b''.join(samples)
mdat = box('mdat', mdat_payload)
mdat_start = len(ftyp)              # file offset of the mdat box
chunk1_off = mdat_start + 8          # samples 0,1,2
chunk2_off = chunk1_off + sum(sizes[:3])  # samples 3,4,5

TIMESCALE = 1000
DELTA = 100                          # 10 fps
DUR = DELTA * len(samples)

mvhd = full('mvhd', 0, 0,
    u32(0) + u32(0) +                # creation, modification
    u32(TIMESCALE) + u32(DUR) +
    u32(0x00010000) + u16(0x0100) + u16(0) +  # rate, volume, reserved
    u32(0) * 2 +                     # reserved
    u32(0x00010000) + u32(0)*3 + u32(0x00010000) + u32(0)*3 + u32(0x40000000) +
    u32(0) * 6 +                     # pre_defined
    u32(2))                          # next track id

tkhd = full('tkhd', 0, 7,
    u32(0) + u32(0) + u32(1) + u32(0) + u32(DUR) +
    u32(0) * 2 + u16(0) + u16(0) + u16(0) + u16(0) +
    u32(0x00010000) + u32(0)*3 + u32(0x00010000) + u32(0)*3 + u32(0x40000000) +
    u32(64 << 16) + u32(48 << 16))   # width 64.0, height 48.0

mdhd = full('mdhd', 0, 0,
    u32(0) + u32(0) + u32(TIMESCALE) + u32(DUR) + u16(0x55C4) + u16(0))

hdlr = full('hdlr', 0, 0,
    u32(0) + b'vide' + u32(0) * 3 + b'VideoHandler\0')

# stsd with one avc1 entry (minimal visual sample entry, no avcC —
# the parser only reads the fourcc)
avc1 = box('avc1',
    b'\0' * 6 + u16(1) +             # reserved + data_reference_index
    u16(0) + u16(0) + u32(0) * 3 +   # pre_defined/reserved
    u16(64) + u16(48) +              # width, height
    u32(0x00480000) + u32(0x00480000) +  # dpi
    u32(0) + u16(1) +                # reserved, frame_count
    b'\0' * 32 +                     # compressor name
    u16(0x18) + struct.pack('>h', -1))
stsd = full('stsd', 0, 0, u32(1) + avc1)

stts = full('stts', 0, 0, u32(1) + u32(len(samples)) + u32(DELTA))
stsc = full('stsc', 0, 0, u32(1) + u32(1) + u32(3) + u32(1))
stsz = full('stsz', 0, 0, u32(0) + u32(len(samples)) +
            b''.join(u32(s) for s in sizes))
stco = full('stco', 0, 0, u32(2) + u32(chunk1_off) + u32(chunk2_off))

stbl = box('stbl', stsd + stts + stsc + stsz + stco)
vmhd = full('vmhd', 0, 1, u16(0) + u16(0) * 3)
dinf = box('dinf', full('dref', 0, 0, u32(1) + full('url ', 0, 1, b'')))
minf = box('minf', vmhd + dinf + stbl)
mdia = box('mdia', mdhd + hdlr + minf)
trak = box('trak', tkhd + mdia)
moov = box('moov', mvhd + trak)

out = ftyp + mdat + moov
open('/root/repo/src/test/resources/media/hand_min.mp4', 'wb').write(out)
print('mp4 fixture written', len(out), 'chunk offsets', chunk1_off, chunk2_off)

# ---------------- fragmented (CMAF/DASH-shaped) fixture: moov with
# EMPTY sample tables + two moof/mdat fragments of 3 samples each,
# default-base-is-moof addressing, per-sample sizes, tfdt bases
def empty_stbl():
    stsd = full('stsd', 0, 0, u32(1) + box('avc1',
        b'\0' * 6 + u16(1) + u16(0) + u16(0) + u32(0) * 3 +
        u16(64) + u16(48) + u32(0x00480000) + u32(0x00480000) +
        u32(0) + u16(1) + b'\0' * 32 + u16(0x18) + struct.pack('>h', -1)))
    return box('stbl', stsd + full('stts', 0, 0, u32(0)) +
               full('stsc', 0, 0, u32(0)) +
               full('stsz', 0, 0, u32(0) + u32(0)) +
               full('stco', 0, 0, u32(0)))

def build_fragmented():
    frag_samples = [
        [bytes([0xB0 + i] * (5 + i)) for i in range(3)],       # fragment 1
        [bytes([0xC0 + i] * (4 + i)) for i in range(3)],       # fragment 2
    ]
    mvhd = full('mvhd', 0, 0,
        u32(0) + u32(0) + u32(TIMESCALE) + u32(0) +
        u32(0x00010000) + u16(0x0100) + u16(0) + u32(0) * 2 +
        u32(0x00010000) + u32(0)*3 + u32(0x00010000) + u32(0)*3 + u32(0x40000000) +
        u32(0) * 6 + u32(2))
    tkhd = full('tkhd', 0, 7,
        u32(0) + u32(0) + u32(1) + u32(0) + u32(0) +
        u32(0) * 2 + u16(0) * 4 +
        u32(0x00010000) + u32(0)*3 + u32(0x00010000) + u32(0)*3 + u32(0x40000000) +
        u32(64 << 16) + u32(48 << 16))
    mdhd = full('mdhd', 0, 0, u32(0) + u32(0) + u32(TIMESCALE) + u32(0) +
                u16(0x55C4) + u16(0))
    hdlr = full('hdlr', 0, 0, u32(0) + b'vide' + u32(0) * 3 + b'VideoHandler\0')
    vmhd = full('vmhd', 0, 1, u16(0) * 4)
    dinf = box('dinf', full('dref', 0, 0, u32(1) + full('url ', 0, 1, b'')))
    minf = box('minf', vmhd + dinf + empty_stbl())
    mdia = box('mdia', mdhd + hdlr + minf)
    trak = box('trak', tkhd + mdia)
    # mvex/trex signals a fragmented movie (parsers may ignore it)
    mvex = box('mvex', full('trex', 0, 0, u32(1) + u32(1) + u32(DELTA) +
                            u32(0) + u32(0)))
    moov = box('moov', mvhd + mvex + trak)

    def box64(tpe, payload):
        # largesize form: size field 1, 64-bit size after the fourcc
        return u32(1) + tpe.encode('ascii') + struct.pack('>Q', 16 + len(payload)) + payload

    out = ftyp + moov
    for fi, samples in enumerate(frag_samples):
        sizes = [len(s) for s in samples]
        mfhd = full('mfhd', 0, 0, u32(fi + 1))
        # tfhd: default-base-is-moof (0x020000), track 1; fragment 2
        # also carries default duration+size (0x08|0x10) feeding its
        # offset-less continuation trun
        tfhd = (full('tfhd', 0, 0x020000, u32(1)) if fi == 0 else
                full('tfhd', 0, 0x020018, u32(1) + u32(DELTA) + u32(len(samples[2]))))
        tfdt = full('tfdt', 0, 0, u32(fi * 3 * DELTA))
        def make_truns(data_off):
            if fi == 0:
                # one trun: offset + per-sample duration/size (0x301)
                body = u32(len(samples)) + struct.pack('>i', data_off)
                for s in samples:
                    body += u32(DELTA) + u32(len(s))
                return full('trun', 0, 0x301, body)
            # fragment 2: TWO truns — the second has NO data offset and
            # continues where the first ended (spec default), with its
            # sample fully defaulted from tfhd
            b1 = u32(2) + struct.pack('>i', data_off)
            for s in samples[:2]:
                b1 += u32(DELTA) + u32(len(s))
            b2 = u32(1)   # flags 0: count only, all defaults
            return full('trun', 0, 0x301, b1) + full('trun', 0, 0x000, b2)
        # fragment 2's moof uses the LARGESIZE header form
        mk = box if fi == 0 else box64
        trun_probe = make_truns(0)
        traf = box('traf', tfhd + tfdt + trun_probe)
        moof_probe = mk('moof', mfhd + traf)
        data_off = len(moof_probe) + 8   # samples start right after mdat hdr
        traf = box('traf', tfhd + tfdt + make_truns(data_off))
        moof = mk('moof', mfhd + traf)
        assert len(moof) == len(moof_probe)
        out += moof + box('mdat', b''.join(samples))
    open('/root/repo/src/test/resources/media/hand_frag.mp4', 'wb').write(out)
    print('fragmented mp4 written', len(out))

build_fragmented()

# ---------------- legacy two-traf fragment: NEITHER base-data-offset
# nor default-base-is-moof in either tfhd. Per ISO 14496-12 §8.8.7 the
# default base is then moof start for the FIRST traf and the end of the
# preceding traf's data for the second — the pre-CMAF multi-track shape.
# traf1 addresses its run explicitly (a moof-start base with an
# offset-less trun is undefined data); traf2's single trun carries NO
# offset and must land exactly where traf1's data ended.
def build_legacy_two_traf():
    t1_samples = [bytes([0xD0 + i] * (5 + i)) for i in range(2)]  # 5,6
    t2_samples = [bytes([0xE0] * 7)]                               # 7
    def trak_of(tid):
        tkhd = full('tkhd', 0, 7,
            u32(0) + u32(0) + u32(tid) + u32(0) + u32(0) +
            u32(0) * 2 + u16(0) * 4 +
            u32(0x00010000) + u32(0)*3 + u32(0x00010000) + u32(0)*3 + u32(0x40000000) +
            u32(64 << 16) + u32(48 << 16))
        mdhd = full('mdhd', 0, 0, u32(0) + u32(0) + u32(TIMESCALE) + u32(0) +
                    u16(0x55C4) + u16(0))
        hdlr = full('hdlr', 0, 0, u32(0) + b'vide' + u32(0) * 3 + b'VideoHandler\0')
        vmhd = full('vmhd', 0, 1, u16(0) * 4)
        dinf = box('dinf', full('dref', 0, 0, u32(1) + full('url ', 0, 1, b'')))
        minf = box('minf', vmhd + dinf + empty_stbl())
        mdia = box('mdia', mdhd + hdlr + minf)
        return box('trak', tkhd + mdia)
    mvhd = full('mvhd', 0, 0,
        u32(0) + u32(0) + u32(TIMESCALE) + u32(0) +
        u32(0x00010000) + u16(0x0100) + u16(0) + u32(0) * 2 +
        u32(0x00010000) + u32(0)*3 + u32(0x00010000) + u32(0)*3 + u32(0x40000000) +
        u32(0) * 6 + u32(3))
    mvex = box('mvex',
        full('trex', 0, 0, u32(1) + u32(1) + u32(DELTA) + u32(0) + u32(0)) +
        full('trex', 0, 0, u32(2) + u32(1) + u32(DELTA) + u32(0) + u32(0)))
    moov = box('moov', mvhd + mvex + trak_of(1) + trak_of(2))

    def make_moof(t1_off):
        mfhd = full('mfhd', 0, 0, u32(1))
        tfhd1 = full('tfhd', 0, 0x000000, u32(1))    # neither flag
        tfdt1 = full('tfdt', 0, 0, u32(0))
        b1 = u32(len(t1_samples)) + struct.pack('>i', t1_off)
        for s in t1_samples:
            b1 += u32(DELTA) + u32(len(s))
        trun1 = full('trun', 0, 0x301, b1)
        tfhd2 = full('tfhd', 0, 0x000000, u32(2))    # neither flag
        tfdt2 = full('tfdt', 0, 0, u32(0))
        b2 = u32(len(t2_samples))                    # NO data offset
        for s in t2_samples:
            b2 += u32(DELTA) + u32(len(s))
        trun2 = full('trun', 0, 0x300, b2)
        return mfhd + box('traf', tfhd1 + tfdt1 + trun1) + \
               box('traf', tfhd2 + tfdt2 + trun2)
    probe = box('moof', make_moof(0))
    # trun data offsets are relative to the traf base (= moof start for
    # traf1), so t1_off is moof-relative: moof size + mdat header
    t1_off = len(probe) + 8
    moof = box('moof', make_moof(t1_off))
    assert len(moof) == len(probe)
    mdat = box('mdat', b''.join(t1_samples) + b''.join(t2_samples))
    out = ftyp + moov + moof + mdat
    open('/root/repo/src/test/resources/media/hand_legacy2traf.mp4','wb').write(out)
    print('legacy two-traf mp4 written', len(out),
          't2 expected offset', len(ftyp) + len(moov) + t1_off + 11)

build_legacy_two_traf()

# ---------------- ctts variant: same 6 samples, v0 composition offsets
# (counts 2+4) so pts = dts + [200,200,0,0,0,0] — B-frame-style delay
def build_with_ctts():
    base = open('/root/repo/src/test/resources/media/hand_min.mp4','rb').read()
    ctts = full('ctts', 0, 0, u32(2) + u32(2) + u32(200) + u32(4) + u32(0))
    # splice ctts into the stbl after stts: find boxes and rebuild sizes
    def patch(buf, path_types, insert_after, extra):
        # returns buf with `extra` inserted after the box `insert_after`
        # found along nested containers in path_types, fixing sizes
        def walk(b, start, end, depth):
            p = start
            while p + 8 <= end:
                size = int.from_bytes(b[p:p+4],'big')
                t = b[p+4:p+8].decode('latin1')
                if depth < len(path_types) and t == path_types[depth]:
                    inner = walk(b, p+8, p+size, depth+1)
                    grown = len(inner) - (size - 8)
                    return (b[start:p] + (size+grown).to_bytes(4,'big') +
                            b[p+4:p+8] + inner + b[p+size:end])
                if depth == len(path_types) and t == insert_after:
                    return b[start:p+size] + extra + b[p+size:end]
                p += size
            return b[start:end]
        return walk(buf, 0, len(buf), 0)
    out = patch(base, ['moov','trak','mdia','minf','stbl'], 'stts', ctts)
    assert len(out) == len(base) + len(ctts)
    open('/root/repo/src/test/resources/media/hand_ctts.mp4','wb').write(out)
    print('ctts mp4 written', len(out))

build_with_ctts()

# ---------------- edit-list variant: splice edts/elst into the ctts
# fixture's trak. One leading EMPTY edit (media_time -1, 500 movie
# ticks of presentation delay) + one media edit with media_time 100
# (head trim). Movie and media timescales are both 1000, so every
# pts shifts by +500-100 = +400: [200,300,200,300,400,500] becomes
# [600,700,600,700,800,900]; dts is untouched.
def build_with_elst():
    base = open('/root/repo/src/test/resources/media/hand_ctts.mp4','rb').read()
    elst = full('elst', 0, 0, u32(2) +
        u32(500) + struct.pack('>i', -1) + u16(1) + u16(0) +
        u32(DUR) + struct.pack('>i', 100) + u16(1) + u16(0))
    edts = box('edts', elst)
    def patch(buf, path_types, insert_after, extra):
        def walk(b, start, end, depth):
            p = start
            while p + 8 <= end:
                size = int.from_bytes(b[p:p+4],'big')
                t = b[p+4:p+8].decode('latin1')
                if depth < len(path_types) and t == path_types[depth]:
                    inner = walk(b, p+8, p+size, depth+1)
                    grown = len(inner) - (size - 8)
                    return (b[start:p] + (size+grown).to_bytes(4,'big') +
                            b[p+4:p+8] + inner + b[p+size:end])
                if depth == len(path_types) and t == insert_after:
                    return b[start:p+size] + extra + b[p+size:end]
                p += size
            return b[start:end]
        return walk(buf, 0, len(buf), 0)
    out = patch(base, ['moov','trak'], 'tkhd', edts)
    assert len(out) == len(base) + len(edts)
    open('/root/repo/src/test/resources/media/hand_elst.mp4','wb').write(out)
    print('elst mp4 written', len(out))

build_with_elst()
