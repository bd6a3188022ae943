// REAL-LIBRARY golden capture for the SEGMENT-FORMAT byte surfaces —
// the round-12 lesson (the sketch capture caught two hash-space bugs
// the re-derived goldens shared) applied to the remaining re-derived
// formats: guava bloom filters, RoaringBitmap serialization, and the
// LZ4 / Snappy / Zstandard chunk codecs. This container's pyspark
// distribution bundles the ACTUAL libraries the reference uses:
//   guava-33.4.8-jre.jar      (OnHeapGuavaBloomFilterCreator.java:62,76)
//   RoaringBitmap-1.3.0.jar   (BitmapInvertedIndexWriter.java:73-76,
//                              OnHeapBitmapInvertedIndexCreator.java:41-45)
//   lz4-java-1.8.0.jar        (LZ4Compressor.java:41, LZ4WithLengthCompressor.java:45)
//   snappy-java-1.1.10.8.jar  (SnappyCompressor.java:41)
//   zstd-jni-1.5.7-6.jar      (ZstandardCompressor.java:42)
//
// Input: a TSV (written by tools/gen_reallib_segment_golden.py) whose
// rows carry the test cases AND the Python writers' blobs, so this
// harness asserts BOTH directions: the real library accepts the Python
// bytes, and (via the captured hex, checked in pytest) the Python
// readers accept the real library's bytes.
//
// Output: one JSON object on stdout -> tests/fixtures/reallib_segment_golden.json
// Regenerate: python tools/gen_reallib_segment_golden.py
import com.github.luben.zstd.Zstd;
import com.google.common.hash.BloomFilter;
import com.google.common.hash.Funnels;
import net.jpountz.lz4.LZ4CompressorWithLength;
import net.jpountz.lz4.LZ4DecompressorWithLength;
import net.jpountz.lz4.LZ4Factory;
import org.roaringbitmap.RoaringBitmap;
import org.roaringbitmap.RoaringBitmapWriter;
import org.xerial.snappy.Snappy;

import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.io.DataOutputStream;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

public class SegmentLibGolden {

    static String hex(byte[] b) {
        StringBuilder sb = new StringBuilder(b.length * 2);
        for (byte x : b) sb.append(String.format("%02x", x));
        return sb.toString();
    }

    static byte[] unhex(String s) {
        byte[] out = new byte[s.length() / 2];
        for (int i = 0; i < out.length; i++) {
            out[i] = (byte) Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16);
        }
        return out;
    }

    static String jstr(String s) {
        return '"' + s.replace("\\", "\\\\").replace("\"", "\\\"") + '"';
    }

    public static void main(String[] args) throws Exception {
        List<String> lines = Files.readAllLines(Paths.get(args[0]), StandardCharsets.UTF_8);
        Map<String, byte[]> payloads = new LinkedHashMap<>();
        Map<String, byte[]> pyCompressed = new LinkedHashMap<>();
        Map<String, String[]> bloomCases = new LinkedHashMap<>();   // name -> [n, fpp, valuesHex]
        Map<String, byte[]> pyBloom = new LinkedHashMap<>();
        Map<String, List<String>> bloomProbes = new LinkedHashMap<>(); // name -> value hexes
        Map<String, byte[]> roarCases = new LinkedHashMap<>();      // name -> LE uint32 array bytes
        Map<String, byte[]> pyRoar = new LinkedHashMap<>();
        Map<String, String[]> idsetCases = new LinkedHashMap<>();   // name -> [dtype, threshold, insertions, fpp, valhex]
        Map<String, byte[]> pyIdset = new LinkedHashMap<>();
        Map<String, List<String>> idsetProbes = new LinkedHashMap<>();
        for (String line : lines) {
            if (line.isEmpty()) continue;
            String[] f = line.split("\t", -1);  // keep trailing empties (empty roar case)
            switch (f[0]) {
                case "payload": payloads.put(f[1], unhex(f[2])); break;
                case "pyc": pyCompressed.put(f[1], unhex(f[2])); break;
                case "bloom": bloomCases.put(f[1], new String[] {f[2], f[3], f[4]}); break;
                case "pybloom": pyBloom.put(f[1], unhex(f[2])); break;
                case "bloomprobe":
                    bloomProbes.computeIfAbsent(f[1], k -> new ArrayList<>()).add(f[2]);
                    break;
                case "roar": roarCases.put(f[1], unhex(f[2])); break;
                case "pyroar": pyRoar.put(f[1], unhex(f[2])); break;
                case "idset":
                    idsetCases.put(f[1], new String[] {f[2], f[3], f[4], f[5], f[6]});
                    break;
                case "pyidset": pyIdset.put(f[1], unhex(f[2])); break;
                case "idsetprobe":
                    idsetProbes.computeIfAbsent(f[1], k -> new ArrayList<>()).add(f[2]);
                    break;
                default: throw new IllegalArgumentException("row kind " + f[0]);
            }
        }

        StringBuilder out = new StringBuilder("{\n");
        out.append("  \"jdk\": ").append(jstr(System.getProperty("java.version")))
           .append(",\n  \"guava\": \"33.4.8\", \"roaringbitmap\": \"1.3.0\",")
           .append(" \"lz4_java\": \"1.8.0\", \"snappy_java\": \"1.1.10.8\", \"zstd_jni\": \"1.5.7-6\",\n")
           .append("  \"lz4_instance\": ").append(jstr(LZ4Factory.fastestInstance().toString())).append(",\n");

        // --- guava bloom filters: reference creates
        // BloomFilter.create(Funnels.stringFunnel(UTF_8), cardinality, fpp)
        // and writeTo's after an 8-byte TYPE/VERSION envelope
        // (OnHeapGuavaBloomFilterCreator.java:62,74-78) ---
        out.append("  \"bloom\": [\n");
        List<String> bloomRows = new ArrayList<>();
        for (Map.Entry<String, String[]> e : bloomCases.entrySet()) {
            String name = e.getKey();
            int n = Integer.parseInt(e.getValue()[0]);
            double fpp = Double.parseDouble(e.getValue()[1]);
            String[] values = new String(unhex(e.getValue()[2]), StandardCharsets.UTF_8).split(" ", -1);
            if (values.length == 1 && values[0].isEmpty()) values = new String[0];
            BloomFilter<String> bf = BloomFilter.create(
                    Funnels.stringFunnel(StandardCharsets.UTF_8), n, fpp);
            for (String v : values) bf.put(v);
            ByteArrayOutputStream baos = new ByteArrayOutputStream();
            bf.writeTo(baos);
            byte[] real = baos.toByteArray();

            byte[] py = pyBloom.get(name);
            boolean envelopeOk = py != null && py.length > 8
                    && py[0] == 0 && py[1] == 0 && py[2] == 0 && py[3] == 1
                    && py[4] == 0 && py[5] == 0 && py[6] == 0 && py[7] == 1;
            byte[] pyGuava = envelopeOk ? Arrays.copyOfRange(py, 8, py.length) : new byte[0];
            boolean pyEqual = Arrays.equals(real, pyGuava);
            boolean pyReadOk;
            try {
                BloomFilter<String> rf = BloomFilter.readFrom(
                        new ByteArrayInputStream(pyGuava),
                        Funnels.stringFunnel(StandardCharsets.UTF_8));
                pyReadOk = true;
                for (String v : values) pyReadOk &= rf.mightContain(v);
            } catch (Exception ex) {
                pyReadOk = false;
            }
            StringBuilder probes = new StringBuilder("[");
            List<String> pl = bloomProbes.getOrDefault(name, new ArrayList<>());
            for (int i = 0; i < pl.size(); i++) {
                String v = new String(unhex(pl.get(i)), StandardCharsets.UTF_8);
                if (i > 0) probes.append(", ");
                probes.append("{\"value_hex\": ").append(jstr(pl.get(i)))
                      .append(", \"contains\": ").append(bf.mightContain(v)).append("}");
            }
            probes.append("]");
            bloomRows.add("    {\"name\": " + jstr(name) + ", \"n\": " + n
                    + ", \"fpp\": " + fpp + ", \"hex\": " + jstr(hex(real))
                    + ", \"py_envelope_ok\": " + envelopeOk
                    + ", \"py_equal\": " + pyEqual
                    + ", \"py_readfrom_ok\": " + pyReadOk
                    + ", \"probes\": " + probes + "}");
        }
        out.append(String.join(",\n", bloomRows)).append("\n  ],\n");

        // --- RoaringBitmap: reference builds via the default
        // RoaringBitmapWriter wizard and serializes the portable format
        // (OnHeapBitmapInvertedIndexCreator.java:41-45 writer per dictId;
        // BitmapInvertedIndexWriter.java:73-76 bitmap.serialize) ---
        out.append("  \"roaring\": [\n");
        List<String> roarRows = new ArrayList<>();
        for (Map.Entry<String, byte[]> e : roarCases.entrySet()) {
            String name = e.getKey();
            byte[] raw = e.getValue();
            RoaringBitmapWriter<RoaringBitmap> w = RoaringBitmapWriter.writer().get();
            int[] vals = new int[raw.length / 4];
            for (int i = 0; i < vals.length; i++) {
                vals[i] = (raw[4 * i] & 0xFF) | (raw[4 * i + 1] & 0xFF) << 8
                        | (raw[4 * i + 2] & 0xFF) << 16 | (raw[4 * i + 3] & 0xFF) << 24;
            }
            for (int v : vals) w.add(v);
            RoaringBitmap rb = w.get();
            ByteArrayOutputStream baos = new ByteArrayOutputStream();
            rb.serialize(new DataOutputStream(baos));
            byte[] real = baos.toByteArray();

            byte[] py = pyRoar.get(name);
            boolean pyEqual = py != null && Arrays.equals(real, py);
            boolean pyDecodeOk;
            try {
                RoaringBitmap back = new RoaringBitmap();
                back.deserialize(new java.io.DataInputStream(new ByteArrayInputStream(py)));
                pyDecodeOk = back.equals(rb);
            } catch (Exception ex) {
                pyDecodeOk = false;
            }
            roarRows.add("    {\"name\": " + jstr(name)
                    + ", \"cardinality\": " + rb.getCardinality()
                    + ", \"hex\": " + jstr(hex(real))
                    + ", \"py_equal\": " + pyEqual
                    + ", \"py_decode_ok\": " + pyDecodeOk + "}");
        }
        out.append(String.join(",\n", roarRows)).append("\n  ],\n");

        // --- chunk codecs: compress each payload with the reference's
        // exact calls; decompress the Python writers' blobs with the
        // reference's exact decompressor calls ---
        out.append("  \"compression\": [\n");
        List<String> compRows = new ArrayList<>();
        LZ4Factory lz4 = LZ4Factory.fastestInstance();
        for (Map.Entry<String, byte[]> e : payloads.entrySet()) {
            String name = e.getKey();
            byte[] p = e.getValue();
            for (String codec : new String[] {"LZ4", "LZ4_LENGTH_PREFIXED", "SNAPPY", "ZSTANDARD"}) {
                byte[] real;
                switch (codec) {
                    case "LZ4": real = lz4.fastCompressor().compress(p); break;
                    case "LZ4_LENGTH_PREFIXED":
                        real = new LZ4CompressorWithLength(lz4.fastCompressor()).compress(p); break;
                    case "SNAPPY": real = Snappy.compress(p); break;
                    default: real = Zstd.compress(p); break;
                }
                byte[] py = pyCompressed.get(name + "|" + codec);
                boolean identical = py != null && Arrays.equals(real, py);
                boolean pyOk;
                try {
                    byte[] back;
                    switch (codec) {
                        case "LZ4": {
                            // LZ4Decompressor.java:42 uses the safe decompressor
                            back = new byte[p.length];
                            int len = lz4.safeDecompressor().decompress(py, 0, py.length, back, 0);
                            back = Arrays.copyOf(back, len);
                            break;
                        }
                        case "LZ4_LENGTH_PREFIXED":
                            back = new LZ4DecompressorWithLength(lz4.fastDecompressor()).decompress(py);
                            break;
                        case "SNAPPY": back = Snappy.uncompress(py); break;
                        default: back = Zstd.decompress(py, p.length); break;
                    }
                    pyOk = Arrays.equals(back, p);
                } catch (Exception ex) {
                    pyOk = false;
                }
                compRows.add("    {\"name\": " + jstr(name) + ", \"codec\": " + jstr(codec)
                        + ", \"payload_len\": " + p.length
                        + ", \"hex\": " + jstr(hex(real))
                        + ", \"py_identical\": " + identical
                        + ", \"py_decompress_ok\": " + pyOk + "}");
            }
        }
        out.append(String.join(",\n", compRows)).append("\n  ],\n");

        // --- Pinot IdSet wire format: reconstruct IdSet.toBytes with
        // the same library calls the reference's thin wrappers make
        // (IdSet.java type tags; RoaringBitmapIdSet.java plain adds +
        // serialize; Roaring64NavigableMapIdSet.java legacy serialize;
        // BloomFilterIdSet.java funnel tag + guava writeTo with the
        // int/long/unencodedChars/byteArray funnels and raw-bits
        // float/double dispatch) ---
        out.append("  \"idset\": [\n");
        List<String> idsetRows = new ArrayList<>();
        for (Map.Entry<String, String[]> e : idsetCases.entrySet()) {
            String name = e.getKey();
            String dtype = e.getValue()[0];
            int threshold = Integer.parseInt(e.getValue()[1]);
            int insertions = Integer.parseInt(e.getValue()[2]);
            double fpp = Double.parseDouble(e.getValue()[3]);
            String valhex = e.getValue()[4];
            byte[] real;
            java.util.function.Predicate<String> containsHex;
            if (threshold > 0 && dtype.equals("INT")) {
                RoaringBitmap rb = new RoaringBitmap();
                for (long v : longsLE(valhex)) rb.add((int) v);
                ByteArrayOutputStream b = new ByteArrayOutputStream();
                b.write(1);
                rb.serialize(new DataOutputStream(b));
                real = b.toByteArray();
                containsHex = h -> rb.contains((int) longsLE(h)[0]);
            } else if (threshold > 0 && dtype.equals("LONG")) {
                org.roaringbitmap.longlong.Roaring64NavigableMap m =
                        new org.roaringbitmap.longlong.Roaring64NavigableMap();
                for (long v : longsLE(valhex)) m.addLong(v);
                ByteArrayOutputStream b = new ByteArrayOutputStream();
                b.write(2);
                try { m.serialize(new DataOutputStream(b)); } catch (Exception ex) { throw new RuntimeException(ex); }
                real = b.toByteArray();
                containsHex = h -> m.contains(longsLE(h)[0]);
            } else {
                BloomFilter bf;
                byte funnelId;
                java.util.function.Predicate<String> c;
                switch (dtype) {
                    case "INT": case "FLOAT": {
                        BloomFilter<Integer> f = BloomFilter.create(
                                com.google.common.hash.Funnels.integerFunnel(), insertions, fpp);
                        if (dtype.equals("FLOAT")) {
                            for (double v : doublesLE(valhex)) f.put(Float.floatToRawIntBits((float) v));
                            c = h -> f.mightContain(Float.floatToRawIntBits((float) doublesLE(h)[0]));
                        } else {
                            for (long v : longsLE(valhex)) f.put((int) v);
                            c = h -> f.mightContain((int) longsLE(h)[0]);
                        }
                        bf = f; funnelId = 0; break;
                    }
                    case "LONG": case "DOUBLE": {
                        BloomFilter<Long> f = BloomFilter.create(
                                com.google.common.hash.Funnels.longFunnel(), insertions, fpp);
                        if (dtype.equals("DOUBLE")) {
                            for (double v : doublesLE(valhex)) f.put(Double.doubleToRawLongBits(v));
                            c = h -> f.mightContain(Double.doubleToRawLongBits(doublesLE(h)[0]));
                        } else {
                            for (long v : longsLE(valhex)) f.put(v);
                            c = h -> f.mightContain(longsLE(h)[0]);
                        }
                        bf = f; funnelId = 1; break;
                    }
                    case "STRING": {
                        BloomFilter<CharSequence> f = BloomFilter.create(
                                com.google.common.hash.Funnels.unencodedCharsFunnel(), insertions, fpp);
                        for (String s : nulJoined(valhex)) f.put(s);
                        c = h -> f.mightContain(nulJoined(h)[0]);
                        bf = f; funnelId = 2; break;
                    }
                    default: {
                        BloomFilter<byte[]> f = BloomFilter.create(
                                com.google.common.hash.Funnels.byteArrayFunnel(), insertions, fpp);
                        // keep empty parts: an empty byte[] is a legal id
                        for (String part : valhex.split(":", -1)) f.put(unhex(part));
                        c = h -> f.mightContain(unhex(h));
                        bf = f; funnelId = 3; break;
                    }
                }
                ByteArrayOutputStream b = new ByteArrayOutputStream();
                b.write(3);
                b.write(funnelId);
                try { bf.writeTo(b); } catch (Exception ex) { throw new RuntimeException(ex); }
                real = b.toByteArray();
                containsHex = c;
            }
            byte[] py = pyIdset.get(name);
            boolean pyEqual = py != null && Arrays.equals(real, py);
            StringBuilder probes = new StringBuilder("[");
            List<String> pl = idsetProbes.getOrDefault(name, new ArrayList<>());
            for (int i = 0; i < pl.size(); i++) {
                if (i > 0) probes.append(", ");
                probes.append("{\"value_hex\": ").append(jstr(pl.get(i)))
                      .append(", \"contains\": ").append(containsHex.test(pl.get(i))).append("}");
            }
            probes.append("]");
            idsetRows.add("    {\"name\": " + jstr(name) + ", \"dtype\": " + jstr(dtype)
                    + ", \"hex\": " + jstr(hex(real))
                    + ", \"py_equal\": " + pyEqual
                    + ", \"probes\": " + probes + "}");
        }
        out.append(String.join(",\n", idsetRows)).append("\n  ]\n}\n");
        System.out.print(out);
    }

    static long[] longsLE(String hexstr) {
        byte[] b = unhex(hexstr);
        long[] out = new long[b.length / 8];
        for (int i = 0; i < out.length; i++) {
            long v = 0;
            for (int j = 7; j >= 0; j--) v = (v << 8) | (b[8 * i + j] & 0xFFL);
            out[i] = v;
        }
        return out;
    }

    static double[] doublesLE(String hexstr) {
        long[] bits = longsLE(hexstr);
        double[] out = new double[bits.length];
        for (int i = 0; i < bits.length; i++) out[i] = Double.longBitsToDouble(bits[i]);
        return out;
    }

    static String[] nulJoined(String hexstr) {
        return new String(unhex(hexstr), StandardCharsets.UTF_8).split("\u0000", -1);
    }
}
