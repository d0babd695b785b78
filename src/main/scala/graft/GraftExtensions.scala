package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

import graft.functions.{Avalanche57, FloatVecDot, StringRollingFp}

/** Spark-native wiring for the engine's Catalyst expressions: set
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit `--conf`,
  * cluster default conf, or `SparkSession.builder.withExtensions`) and
  * every session — including pure-SQL surfaces like the Thrift server,
  * where no Scala code runs to call a `register()` helper — resolves the
  * graft functions by name:
  *
  *   - `graft_fp(text)` — the portable mod-2^57 polynomial rolling
  *     fingerprint ([[graft.functions.StringRollingFp]]), the hash the
  *     dedup/sampling/split family votes on (q31/q37/q55…); DuckDB
  *     reproduces it bit-for-bit, which is what makes those relations
  *     oracle-checkable.
  *   - `graft_mix57(x)` — the 57-bit finalizer avalanche
  *     ([[graft.functions.Avalanche57]]) behind the count-min/HLL/bloom
  *     sketch hash family (q139/q140/q170), with the standard
  *     [[graft.ops.Sketch.MixK1]]/[[graft.ops.Sketch.MixK2]] constants.
  *   - `vec_dot(a, b)` / `vec_cosine(a, b)` — the codegen'd float-array
  *     kernels ([[graft.functions.FloatVecDot]]) the similarity-search
  *     family runs on.
  *
  * All four are native `Expression`s with `doGenCode` — they stay inside
  * whole-stage codegen, unlike a UDF, which is the point of exposing
  * THESE rather than Scala closures. [[graft.core.Sessions.builder]]
  * applies this class by default, so library-built sessions and
  * config-wired sessions resolve the same names.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity gate: a mis-called function must fail analysis with a real
    // wrong-number-of-arguments error naming the function — not silently
    // drop extra arguments via exprs.head, and not surface an opaque
    // NoSuchElementException on zero arguments
    def inject(name: String, arity: Int,
               builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        exprs => {
          if (exprs.length != arity)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> arity.toString,
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          builder(exprs)
        }))

    inject("graft_fp", 1, exprs =>
      StringRollingFp(exprs.head, graft.llm.TextAnalysis.FingerprintMod))
    inject("graft_mix57", 1, exprs =>
      Avalanche57(exprs.head, graft.ops.Sketch.MixK1, graft.ops.Sketch.MixK2))
    inject("vec_dot", 2, exprs => FloatVecDot(exprs(0), exprs(1)))
    inject("vec_cosine", 2, exprs =>
      Divide(FloatVecDot(exprs(0), exprs(1)),
        Multiply(Sqrt(FloatVecDot(exprs(0), exprs(0))),
          Sqrt(FloatVecDot(exprs(1), exprs(1))))))
  }
}
