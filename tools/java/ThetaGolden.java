// Golden-vector generator for operators/theta_ds.py, run on the REAL
// JDK (17 in this container): captures ground truth for the parts of
// the DataSketches-compatible theta wire contract that depend on Java
// semantics — signed 64-bit arithmetic and `>>>`, Double.doubleToLongBits
// NaN canonicalization (any NaN payload -> 0x7ff8000000000000), UTF-8
// encoding of non-BMP strings, and the little-endian compact-ordered
// preamble layout. The MurmurHash3 x64-128 algorithm itself is the
// published public-domain algorithm (Austin Appleby) that
// datasketches-java's MurmurHash3.java implements over a long[]'s
// little-endian byte layout; the seed-hash rule (low 16 bits of
// murmur3(seed as one LE long, seed 0)), the 63-bit sketch hash
// (hash[0] >>> 1), the canonical update() input bytes (long -> 8-byte
// LE; double -> doubleToLongBits with -0.0 -> +0.0; string -> UTF-8),
// and the compact serialization byte map (preambleLongs|serVer|family|
// lgNomLongs|lgArrLongs|flags|seedHash, then curCount|p, then thetaLong
// when estimating, then sorted hashes — empty = 1 preamble long,
// single-item = 1 preamble long + hash) are re-derived from the PUBLIC
// Apache DataSketches format specification (datasketches-java
// ThetaUtil.java / CompactSketch.java, Apache-2.0; the jar is not in
// this container). These fixtures pin Java-semantics parity; a byte
// capture from the real org.apache.datasketches jar remains the
// documented residual (tests/test_theta_golden.py).
//
// Output: one JSON object on stdout -> tests/fixtures/theta_jdk17_golden.json
// Regenerate: javac -encoding UTF-8 ThetaGolden.java && java -Dfile.encoding=UTF-8 ThetaGolden
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.nio.charset.StandardCharsets;
import java.util.Arrays;
import java.util.TreeSet;

public class ThetaGolden {

    static final long C1 = 0x87c37b91114253d5L;
    static final long C2 = 0x4cf5ad432745937fL; // canonical (r12: was a corrupted transcription, caught by the real-jar capture)

    static long fmix64(long k) {
        k ^= k >>> 33;
        k *= 0xff51afd7ed558ccdL;
        k ^= k >>> 33;
        k *= 0xc4ceb9fe1a85ec53L;
        k ^= k >>> 33;
        return k;
    }

    // MurmurHash3 x64-128 over bytes (little-endian block reads), the
    // public algorithm behind datasketches-java MurmurHash3 — its
    // long[] entry point is this over the array's LE byte layout.
    static long[] murmur3(byte[] data, long seed) {
        long h1 = seed, h2 = seed;
        int nblocks = data.length / 16;
        ByteBuffer bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN);
        for (int i = 0; i < nblocks; i++) {
            long k1 = bb.getLong(i * 16);
            long k2 = bb.getLong(i * 16 + 8);
            k1 *= C1; k1 = Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1;
            h1 = Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L;
            k2 *= C2; k2 = Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2;
            h2 = Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L;
        }
        int tailStart = nblocks * 16;
        int tailLen = data.length - tailStart;
        long k1 = 0, k2 = 0;
        for (int i = tailLen - 1; i >= 8; i--)
            k2 = (k2 << 8) | (data[tailStart + i] & 0xffL);
        for (int i = Math.min(tailLen, 8) - 1; i >= 0; i--)
            k1 = (k1 << 8) | (data[tailStart + i] & 0xffL);
        if (tailLen > 8) {
            k2 *= C2; k2 = Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2;
        }
        if (tailLen > 0) {
            k1 *= C1; k1 = Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1;
        }
        h1 ^= data.length; h2 ^= data.length;
        h1 += h2; h2 += h1;
        h1 = fmix64(h1); h2 = fmix64(h2);
        h1 += h2; h2 += h1;
        return new long[] {h1, h2};
    }

    static byte[] leLong(long v) {
        return ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
                .putLong(v).array();
    }

    // ThetaUtil.computeSeedHash: low 16 bits of murmur3(seed as one LE
    // long, seed 0); zero is illegal.
    static int computeSeedHash(long seed) {
        int sh = (int) (murmur3(leLong(seed), 0)[0] & 0xffffL);
        if (sh == 0) throw new IllegalStateException("zero seedHash");
        return sh;
    }

    // 63-bit positive sketch hash: hash[0] >>> 1.
    static long hash63(byte[] data, long seed) {
        return murmur3(data, seed)[0] >>> 1;
    }

    // Canonical update() input bytes per UpdateSketch: update(long) ->
    // 8-byte LE; update(double) -> doubleToLongBits of (d == 0.0 ? 0.0
    // : d) — Java canonicalizes EVERY NaN payload to 0x7ff8...; strings
    // as UTF-8.
    static byte[] canonicalDouble(double d) {
        double dd = (d == 0.0) ? 0.0 : d;
        return leLong(Double.doubleToLongBits(dd));
    }

    static final int SER_VER = 3, FAMILY_COMPACT = 3;
    static final int FLAGS = 2 | 8 | 16; // READ_ONLY | COMPACT | ORDERED
    static final long MAX_THETA = Long.MAX_VALUE;

    // Compact ordered serialization (CompactSketch byte map),
    // r12-corrected to match the REAL datasketches-java 6.2.0 bytes
    // (RealLibGolden capture): lgNomLongs byte is 0 in compact form,
    // the canonical EMPTY zeroes the seedHash, and the single-item
    // layout sets flag bit 0x20 (SINGLE_ITEM).
    static byte[] serialize(long thetaLong, long[] sortedHashes,
                            int seedHash, int lgNomLongs) {
        int n = sortedHashes.length;
        boolean empty = n == 0 && thetaLong == MAX_THETA;
        boolean single = n == 1 && thetaLong == MAX_THETA;
        int preLongs = empty || single ? 1 : (thetaLong == MAX_THETA ? 2 : 3);
        int size = empty ? 8 : single ? 16 : preLongs * 8 + n * 8;
        ByteBuffer bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN);
        bb.put((byte) preLongs).put((byte) SER_VER).put((byte) FAMILY_COMPACT)
          .put((byte) 0).put((byte) 0)
          .put((byte) (empty ? FLAGS | 4 : single ? FLAGS | 32 : FLAGS))
          .putShort((short) (empty ? 0 : seedHash));
        if (empty) return bb.array();
        if (single) { bb.putLong(sortedHashes[0]); return bb.array(); }
        bb.putInt(n).putFloat(1.0f);
        if (preLongs == 3) bb.putLong(thetaLong);
        for (long h : sortedHashes) bb.putLong(h);
        return bb.array();
    }

    static String hex(byte[] b) {
        StringBuilder sb = new StringBuilder(b.length * 2);
        for (byte x : b) sb.append(String.format("%02x", x));
        return sb.toString();
    }

    static String jstr(String s) {
        return '"' + s.replace("\\", "\\\\").replace("\"", "\\\"") + '"';
    }

    public static void main(String[] args) {
        final long SEED = 9001L; // ThetaUtil.DEFAULT_UPDATE_SEED
        StringBuilder out = new StringBuilder("{\n");
        out.append("  \"jdk\": ").append(jstr(System.getProperty("java.version"))).append(",\n");

        // --- seed hashes
        out.append("  \"seed_hashes\": {");
        long[] seeds = {9001L, 1L, 12345L, 987654321L};
        for (int i = 0; i < seeds.length; i++) {
            out.append(jstr(Long.toString(seeds[i]))).append(": ")
               .append(computeSeedHash(seeds[i]))
               .append(i < seeds.length - 1 ? ", " : "");
        }
        out.append("},\n");

        // --- 63-bit hashes of canonical inputs (longs, doubles incl.
        // NaN payload canonicalization and -0.0, UTF-8 strings)
        out.append("  \"hashes\": [\n");
        StringBuilder rows = new StringBuilder();
        long[] longs = {0L, 1L, -1L, 42L, 1234567890123L,
                        Long.MIN_VALUE, Long.MAX_VALUE};
        for (long v : longs) {
            rows.append("    [\"long\", ").append(jstr(Long.toString(v)))
                .append(", ").append(jstr(Long.toUnsignedString(hash63(leLong(v), SEED))))
                .append("],\n");
        }
        double[] dbls = {0.0, -0.0, 1.5, -2.75, 1e300, 4.9e-324,
                         Double.NaN, Double.longBitsToDouble(0x7ff8000000000001L),
                         Double.longBitsToDouble(0xfff8000000000000L),
                         Double.POSITIVE_INFINITY};
        for (double d : dbls) {
            rows.append("    [\"double\", ")
                .append(jstr(String.format("%016x", Double.doubleToRawLongBits(d))))
                .append(", ").append(jstr(Long.toUnsignedString(hash63(canonicalDouble(d), SEED))))
                .append("],\n");
        }
        String[] strs = {"a", "hurricane", "the quick brown fox", "日本語",
                         "café", "😀"};
        for (String s : strs) {
            rows.append("    [\"string\", ").append(jstr(s)).append(", ")
                .append(jstr(Long.toUnsignedString(
                        hash63(s.getBytes(StandardCharsets.UTF_8), SEED))))
                .append("],\n");
        }
        rows.setLength(rows.length() - 2);
        out.append(rows).append("\n  ],\n");

        // --- serialized compact sketches: empty, single-item,
        // exact-mode (2 preamble longs), estimation-mode (3 preamble
        // longs, synthetic theta = the trim boundary an UpdateSketch
        // emits); hashes generated through the same hash path so the
        // fixture cross-checks hashing AND layout
        int sh = computeSeedHash(SEED);
        out.append("  \"sketches\": [\n");
        out.append("    {\"desc\": \"empty\", \"lg_nom\": 12, \"theta\": ")
           .append(MAX_THETA).append(", \"hashes\": [], \"hex\": ")
           .append(jstr(hex(serialize(MAX_THETA, new long[] {}, sh, 12)))).append("},\n");
        long h7 = hash63(leLong(7L), SEED);
        out.append("    {\"desc\": \"single\", \"lg_nom\": 12, \"theta\": ")
           .append(MAX_THETA).append(", \"hashes\": [")
           .append(jstr(Long.toString(h7))).append("], \"hex\": ")
           .append(jstr(hex(serialize(MAX_THETA, new long[] {h7}, sh, 12)))).append("},\n");
        TreeSet<Long> hs = new TreeSet<>();
        for (long v = 1; v <= 20; v++) hs.add(hash63(leLong(v), SEED));
        long[] exact = hs.stream().mapToLong(Long::longValue).toArray();
        out.append("    {\"desc\": \"exact20\", \"lg_nom\": 8, \"theta\": ")
           .append(MAX_THETA).append(", \"hashes\": [");
        for (int i = 0; i < exact.length; i++)
            out.append(jstr(Long.toString(exact[i])))
               .append(i < exact.length - 1 ? ", " : "");
        out.append("], \"hex\": ")
           .append(jstr(hex(serialize(MAX_THETA, exact, sh, 8)))).append("},\n");
        // estimation mode: keep the 8 smallest of the 20, theta = the
        // 9th smallest (every retained hash < theta, the trim invariant)
        long[] kept = Arrays.copyOf(exact, 8);
        long theta = exact[8];
        out.append("    {\"desc\": \"estimating8\", \"lg_nom\": 4, \"theta\": ")
           .append(theta).append(", \"hashes\": [");
        for (int i = 0; i < kept.length; i++)
            out.append(jstr(Long.toString(kept[i])))
               .append(i < kept.length - 1 ? ", " : "");
        out.append("], \"hex\": ")
           .append(jstr(hex(serialize(theta, kept, sh, 4)))).append("}\n");
        out.append("  ]\n}\n");
        System.out.print(out);
    }
}
