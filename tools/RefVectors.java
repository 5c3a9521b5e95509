import fi.iki.yak.ts.compression.gorilla.*;
import fi.iki.yak.ts.compression.gorilla.predictors.*;
import gr.aueb.compression.gorilla.*;

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.util.ArrayList;
import java.util.List;

/**
 * One-shot golden-vector generator. Reads a tiny line protocol on stdin
 * describing codec test cases, runs the REFERENCE implementation
 * (compiled from /root/reference, unmodified), and emits JSON lines with
 * the exact bitstreams + decoded output. The JSON files are committed as
 * test fixtures; Java is not needed at pytest time.
 *
 * Protocol:
 *   CASE name
 *   MODE gorilla64 | gorilla64_dfcm:<size> | v1 | v32 | lossy32:<log> | pmc:<epsBitsHex> | swing:<epsBitsHex>
 *   BLOCKTS <long>           (gorilla only)
 *   CLOSE 0|1                (default 1)
 *   N <count>
 *   <ts> <valueBitsHex>      x count   (unsigned hex, 64- or 32-bit)
 *   END
 */
public class RefVectors {
    public static void main(String[] args) throws Exception {
        BufferedReader br = new BufferedReader(new InputStreamReader(System.in));
        String line;
        String name = null, mode = null;
        long blockTs = 0;
        boolean doClose = true;
        List<long[]> pts = null;
        while ((line = br.readLine()) != null) {
            line = line.trim();
            if (line.isEmpty()) continue;
            String[] p = line.split("\\s+");
            switch (p[0]) {
                case "CASE": name = p[1]; mode = null; blockTs = 0; doClose = true; pts = new ArrayList<>(); break;
                case "MODE": mode = p[1]; break;
                case "BLOCKTS": blockTs = Long.parseLong(p[1]); break;
                case "CLOSE": doClose = p[1].equals("1"); break;
                case "N": break;
                case "END": emit(name, mode, blockTs, doClose, pts); break;
                default: pts.add(new long[]{Long.parseLong(p[0]), Long.parseUnsignedLong(p[1], 16)}); break;
            }
        }
    }

    static void emit(String name, String mode, long blockTs, boolean doClose, List<long[]> pts) {
        StringBuilder sb = new StringBuilder();
        sb.append("{\"name\":\"").append(name).append("\",\"mode\":\"").append(mode).append("\"");
        if (mode.startsWith("gorilla64")) {
            LongArrayOutput out = new LongArrayOutput();
            Predictor pc = mode.contains("dfcm") ? new DifferentialFCM(Integer.parseInt(mode.split(":")[1])) : new LastValuePredictor();
            GorillaCompressor c = new GorillaCompressor(blockTs, out, pc);
            for (long[] q : pts) c.addValue(q[0], q[1]);
            if (doClose) c.close();
            long[] arr = out.getLongArray();
            appendLongs(sb, "longs", arr);
            Predictor pd = mode.contains("dfcm") ? new DifferentialFCM(Integer.parseInt(mode.split(":")[1])) : new LastValuePredictor();
            GorillaDecompressor d = new GorillaDecompressor(new LongArrayInput(arr), pd);
            sb.append(",\"decoded\":[");
            for (int i = 0; ; i++) {
                Pair pr;
                if (!doClose && i >= pts.size()) break; // unterminated stream: only read n pairs
                pr = d.readPair();
                if (pr == null) break;
                if (i > 0) sb.append(",");
                sb.append("[").append(pr.getTimestamp()).append(",\"").append(Long.toHexString(pr.getLongValue())).append("\"]");
            }
            sb.append("]");
        } else if (mode.equals("v1")) {
            LongArrayOutput out = new LongArrayOutput();
            Compressor c = new Compressor(out);
            for (long[] q : pts) c.addValue(q[1]);
            if (doClose) c.close();
            long[] arr = out.getLongArray();
            appendLongs(sb, "longs", arr);
            sb.append(",\"size\":").append(c.getSize());
            Decompressor d = new Decompressor(new LongArrayInput(arr));
            sb.append(",\"decoded\":[");
            for (int i = 0; ; i++) {
                if (!doClose && i >= pts.size()) break;
                fi.iki.yak.ts.compression.gorilla.Value v = d.readPair();
                if (v == null) break;
                if (i > 0) sb.append(",");
                sb.append("\"").append(Long.toHexString(v.getLongValue())).append("\"");
            }
            sb.append("]");
        } else if (mode.equals("v32")) {
            LongArrayOutput out = new LongArrayOutput();
            Compressor32 c = new Compressor32(out);
            for (long[] q : pts) c.addValue((int) q[1]);
            if (doClose) c.close();
            long[] arr = out.getLongArray();
            appendLongs(sb, "longs", arr);
            sb.append(",\"size\":").append(c.getSize());
            Decompressor32 d = new Decompressor32(new LongArrayInput(arr));
            sb.append(",\"decoded\":[");
            for (int i = 0; ; i++) {
                if (!doClose && i >= pts.size()) break;
                gr.aueb.compression.gorilla.Value v = d.readValue();
                if (v == null) break;
                if (i > 0) sb.append(",");
                sb.append("\"").append(Integer.toHexString(v.getIntValue())).append("\"");
            }
            sb.append("]");
        } else if (mode.startsWith("lossy32")) {
            int log = Integer.parseInt(mode.split(":")[1]);
            LongArrayOutput out = new LongArrayOutput();
            LossyCompressor32 c = new LossyCompressor32(out, log);
            for (long[] q : pts) c.addValue((int) q[1]);
            if (doClose) c.close();
            long[] arr = out.getLongArray();
            appendLongs(sb, "longs", arr);
            sb.append(",\"size\":").append(c.getSize());
            int[] cs = c.getCases();
            sb.append(",\"cases\":[").append(cs[0]).append(",").append(cs[1]).append(",").append(cs[2]).append("]");
            Decompressor32 d = new Decompressor32(new LongArrayInput(arr));
            sb.append(",\"decoded\":[");
            for (int i = 0; ; i++) {
                gr.aueb.compression.gorilla.Value v = d.readValue();
                if (v == null) break;
                if (i > 0) sb.append(",");
                sb.append("\"").append(Integer.toHexString(v.getIntValue())).append("\"");
            }
            sb.append("]");
        } else if (mode.startsWith("pmc") || mode.startsWith("swing")) {
            float eps = Float.intBitsToFloat((int) Long.parseUnsignedLong(mode.split(":")[1], 16));
            List<Point> points = new ArrayList<>();
            for (long[] q : pts) points.add(new Point(q[0], Float.intBitsToFloat((int) q[1])));
            if (mode.startsWith("pmc")) {
                List<PmcMR.Constant> segs = new PmcMR().filter(points, eps);
                sb.append(",\"segments\":[");
                for (int i = 0; i < segs.size(); i++) {
                    PmcMR.Constant s = segs.get(i);
                    if (i > 0) sb.append(",");
                    sb.append("[").append(s.getInitialTimestamp()).append(",").append(s.getFinalTimestamp())
                      .append(",\"").append(Integer.toHexString(Float.floatToRawIntBits(s.getValue()))).append("\"]");
                }
                sb.append("]");
                DecompressorPmcMr d = new DecompressorPmcMr(segs);
                sb.append(",\"reconstructed\":[");
                for (int i = 0; ; i++) {
                    Float v = d.readValue();
                    if (v == null) break;
                    if (i > 0) sb.append(",");
                    sb.append("\"").append(Integer.toHexString(Float.floatToRawIntBits(v))).append("\"");
                }
                sb.append("]");
            } else {
                List<SwingFilter.SwingSegment> segs = new SwingFilter().filter(points, eps);
                sb.append(",\"segments\":[");
                for (int i = 0; i < segs.size(); i++) {
                    SwingFilter.SwingSegment s = segs.get(i);
                    if (i > 0) sb.append(",");
                    sb.append("[").append(s.getInitialTimestamp()).append(",").append(s.getFinalTimestamp())
                      .append(",\"").append(Long.toHexString(Double.doubleToRawLongBits(s.getLine().a)))
                      .append("\",\"").append(Long.toHexString(Double.doubleToRawLongBits(s.getLine().b))).append("\"]");
                }
                sb.append("]");
                DecompressorSwingFilter d = new DecompressorSwingFilter(segs);
                sb.append(",\"reconstructed\":[");
                for (int i = 0; ; i++) {
                    Float v = d.readValue();
                    if (v == null) break;
                    if (i > 0) sb.append(",");
                    sb.append("\"").append(Integer.toHexString(Float.floatToRawIntBits(v))).append("\"");
                }
                sb.append("]");
            }
        }
        sb.append("}");
        System.out.println(sb);
    }

    static void appendLongs(StringBuilder sb, String key, long[] arr) {
        sb.append(",\"").append(key).append("\":[");
        for (int i = 0; i < arr.length; i++) {
            if (i > 0) sb.append(",");
            sb.append("\"").append(Long.toHexString(arr[i])).append("\"");
        }
        sb.append("]");
    }
}
