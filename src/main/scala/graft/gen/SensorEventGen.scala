package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator for the reference's sensor-event union schema
  * (FIXTURES.md §2; sensor.py:24-32, 38-102): envelope
  * (sensor_id, type, timestamp, zip, seq) + per-type nullable payload +
  * nullable `unusual`. Seeded hash arithmetic replaces `random.*` calls
  * (F14: never unseeded); value ranges match the reference exactly:
  *   traffic: avg_speed uniform(20,80) r2; vehicle counts 0..50 per class
  *   environment: temperature uniform(-10,40) r2; humidity 20..100; aqi 0..500
  *   utility: consumption uniform(0,2000); voltage uniform(110,240); current uniform(0,50)
  *   water: pH uniform(6.5,8.5); turbidity uniform(0.1,5.0); contaminant 0..100
  * Unusual injection (sensor.py:111-132): probability p, ONE numeric field
  * of the type's field map multiplied by an int-preserving factor in [2,5],
  * `unusual=true` only when injected.
  */
object SensorEventGen {
  val Types = Seq("traffic", "environment", "utility", "water")
  val VehicleClasses = Seq("sedan", "SUV", "truck", "bus", "motorcycle")

  private def h(seed: Long, c: Column*): Column = xxhash64((lit(seed) +: c): _*)
  private def b(seed: Long, id: Column, m: Int): Column = pmod(h(seed, id), lit(m))
  /** uniform(lo, hi) rounded to 2 d.p. (sensor.py F5 convention). */
  private def unif(seed: Long, id: Column, lo: Double, hi: Double): Column =
    round(lit(lo) + b(seed, id, 1000000).cast("double") / 1000000.0 * (hi - lo), 2)

  def generate(spark: SparkSession, rows: Long, unusualProb: Double = 0.05,
               seed: Long = 42): DataFrame = {
    val id = col("id")
    val typ = element_at(array(Types.map(lit): _*), (b(seed, id, 4) + 1).cast("int"))
    val isTraffic = typ === "traffic"
    val isEnv = typ === "environment"
    val isUtil = typ === "utility"
    val isWater = typ === "water"

    val vd = map(VehicleClasses.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c), b(seed + 10 + i, id, 51).cast("int"))
    }: _*)
    // unusual: with prob p, multiply ONE numeric field by int factor in [2,5]
    val isUnusual = b(seed + 20, id, 10000) < (unusualProb * 10000).toInt
    val mult = (b(seed + 21, id, 4) + 2).cast("double") // ∈ {2,3,4,5}
    // per type, the perturbed field index within its field map (sensor.py:117-123)
    val fieldPick = b(seed + 22, id, 2) // two candidate fields per type

    def maybe(cond: Column, v: Column, isInt: Boolean): Column = {
      // int-preserving: type(orig)(round(orig * m, 2)) — sensor.py:129
      val perturbed = if (isInt) round(v * mult, 2).cast("int") else round(v * mult, 2)
      when(cond && isUnusual, perturbed).otherwise(v)
    }

    val avgSpeed = unif(seed + 1, id, 20, 80)
    val vehicleCount = aggregate(map_values(vd), lit(0), (acc, x) => acc + x)
    val temperature = unif(seed + 2, id, -10, 40)
    val humidity = (b(seed + 3, id, 81) + 20).cast("int")
    val aqi = b(seed + 4, id, 501).cast("int")
    val consumption = unif(seed + 5, id, 0, 2000)
    val voltage = unif(seed + 6, id, 110, 240)
    val current = unif(seed + 7, id, 0, 50)
    val ph = unif(seed + 8, id, 6.5, 8.5)
    val turbidity = unif(seed + 9, id, 0.1, 5.0)
    val contaminant = b(seed + 30, id, 101).cast("int")

    spark.range(rows)
      .withColumn("type", typ)
      .withColumn("sensor_id", concat(
        when(isEnv, "env").when(isUtil, "utility").when(isWater, "water").otherwise("traffic"),
        lit("_"), (b(seed + 31, id, 100) + 1).cast("string")))
      // timestamps are DATA (T3: creation-time), derived deterministically
      .withColumn("timestamp", date_format(
        timestamp_seconds(lit(1735689600L) + id), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .withColumn("zip", format_string("%03d", (b(seed + 32, id, 100) + 1).cast("int")))
      .withColumn("seq", id)
      .withColumn("vehicle_count",
        when(isTraffic, maybe(fieldPick === 0, vehicleCount, isInt = true)).otherwise(lit(null)))
      .withColumn("avg_speed",
        when(isTraffic, maybe(fieldPick === 1, avgSpeed, isInt = false)).otherwise(lit(null)))
      .withColumn("vehicle_distribution", when(isTraffic, vd).otherwise(lit(null)))
      .withColumn("temperature",
        when(isEnv, maybe(fieldPick === 0, temperature, isInt = false)).otherwise(lit(null)))
      .withColumn("humidity", when(isEnv, humidity).otherwise(lit(null)))
      .withColumn("air_quality_index",
        when(isEnv, maybe(fieldPick === 1, aqi, isInt = true)).otherwise(lit(null)))
      .withColumn("consumption",
        when(isUtil, maybe(fieldPick === 0, consumption, isInt = false)).otherwise(lit(null)))
      .withColumn("voltage",
        when(isUtil, maybe(fieldPick === 1, voltage, isInt = false)).otherwise(lit(null)))
      .withColumn("current", when(isUtil, current).otherwise(lit(null)))
      .withColumn("pH",
        when(isWater, maybe(fieldPick === 0, ph, isInt = false)).otherwise(lit(null)))
      .withColumn("turbidity",
        when(isWater, maybe(fieldPick === 1, turbidity, isInt = false)).otherwise(lit(null)))
      .withColumn("contaminant_level", when(isWater, contaminant).otherwise(lit(null)))
      // `unusual` present only when injected (sensor.py:131) → null otherwise
      .withColumn("unusual", when(isUnusual, lit(true)).otherwise(lit(null).cast("boolean")))
      .drop("id")
  }
}
