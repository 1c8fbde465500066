#!/usr/bin/env python3
"""MPEG-audio frame fixtures, hand-assembled from the public ISO/IEC
11172-3 header layout — an independent second implementation for
graft's MpegAudio walker.

File 1 (hand_cbr.mp3): ID3v2 tag (20-byte payload) + 5 MPEG1 Layer III
128 kbps 44100 Hz stereo frames (417 B each, no padding).
File 2 (hand_vbr.mp3): 2 B garbage + MPEG1 L3 frames at 128/192/256
kbps (resync + VBR mean), mono.
"""
import struct

def header(ver_bits, layer_bits, br_idx, sr_idx, padding, mode):
    h = (0x7FF << 21) | (ver_bits << 19) | (layer_bits << 17) | (1 << 16)
    h |= (br_idx << 12) | (sr_idx << 10) | (padding << 9) | (mode << 6)
    return struct.pack('>I', h)

BR_V1_L3 = [32,40,48,56,64,80,96,112,128,160,192,224,256,320]

def frame_v1_l3(kbps, rate, mode, fill):
    idx = BR_V1_L3.index(kbps) + 1
    sr_idx = {44100:0, 48000:1, 32000:2}[rate]
    size = 144 * kbps * 1000 // rate
    return header(3, 1, idx, sr_idx, 0, mode) + bytes([fill]) * (size - 4)

id3 = b'ID3' + bytes([4,0]) + bytes([0]) + bytes([0,0,0,20]) + b'\0'*20
cbr = id3 + b''.join(frame_v1_l3(128, 44100, 0, 0x11 * (i+1)) for i in range(5))
open('/root/repo/src/test/resources/media/hand_cbr.mp3','wb').write(cbr)
print('cbr written', len(cbr), 'frame size', 144*128000//44100)

vbr = b'\xAB\xCD'
for kbps in (128, 192, 256):
    vbr += frame_v1_l3(kbps, 44100, 3, kbps & 0xff)
open('/root/repo/src/test/resources/media/hand_vbr.mp3','wb').write(vbr)
print('vbr written', len(vbr))
