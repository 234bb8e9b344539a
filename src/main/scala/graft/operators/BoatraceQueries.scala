package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.boatrace.BoatracePipeline

/** Driver-visible entry points for the boatrace parity pipeline. These
  * ignore the testdata sfDir (they read the reference's own CP932
  * corpus) and therefore carry no DuckDB oracle — their correctness
  * gate is the golden differential suite (KbParserGoldenSpec /
  * BoatracePipelineSpec: odds byte-identical and race table
  * value-identical to the reference outputs for all 31 August-2020
  * dates).
  */
object BoatraceQueries {

  private val txtDir = "/root/reference/txt"

  // Parse once per session (the parsed dataset is persisted; four
  // queries share it instead of each re-reading the corpus).
  private val parsedCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      org.apache.spark.sql.Dataset[BoatracePipeline.ParsedFile]]()

  private def tables(s: SparkSession) = {
    val parsed = parsedCache.computeIfAbsent(s,
      sess => BoatracePipeline.parseDir(sess, txtDir))
    (BoatracePipeline.envDf(s, parsed), BoatracePipeline.resultDf(s, parsed),
      BoatracePipeline.oddsDf(s, parsed),
      BoatracePipeline.scheduleDf(s, parsed))
  }

  val all: Seq[QueryDef] = Seq(

    // The reference's flagship artifact: the denormalized race table
    // (main.py:257-263), typed and decomposed for partition pruning.
    QueryDef.noOracle("boatrace_race_table") { (s, _) =>
      val (env, result, _, schedule) = tables(s)
      BoatracePipeline.typedRace(
        BoatracePipeline.raceTable(env, result, schedule))
        .orderBy("レースID", "艇番")
    },

    // Odds payout table (main.py:107) with void sentinel semantics.
    QueryDef.noOracle("boatrace_odds") { (s, _) =>
      tables(s)._3.orderBy("レースID")
    },

    // SURVEY §2.6: the per-player aggregates the reference's
    // downstream model needs (starts / wins / mean exhibition time) —
    // README.md:19's 出走回数 / 優勝回数 / 平均ST class of features.
    QueryDef.noOracle("boatrace_player_stats") { (s, _) =>
      val (env, result, _, schedule) = tables(s)
      val race = BoatracePipeline.typedRace(
        BoatracePipeline.raceTable(env, result, schedule))
      race.groupBy("選手登番")
        .agg(
          count(lit(1)).as("starts"),
          sum(when(col("順位") === 1, 1).otherwise(0)).as("wins"),
          round(avg("展示"), 4).as("avg_exhibition"),
          round(avg("全国勝率"), 4).as("avg_national_win_rate"))
        .orderBy("選手登番")
    },

    // Leak-free ML feature view: per (race, player), the player's form
    // STRICTLY BEFORE that race — prior starts / wins / win rate /
    // mean exhibition time. This is the feature shape the reference's
    // downstream LightGBM model needs (README.md:19): computing it
    // with a plain groupBy (boatrace_player_stats) leaks the race's
    // own outcome into its features; the `rowsBetween(unbounded, -1)`
    // frame cannot. One shuffle on 選手登番, then a single ordered
    // window pass per player.
    QueryDef.noOracle("boatrace_player_form") { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val (env, result, _, schedule) = tables(s)
      val race = BoatracePipeline.typedRace(
        BoatracePipeline.raceTable(env, result, schedule))
      val w = Window.partitionBy("選手登番").orderBy("date", "レースID")
        .rowsBetween(Window.unboundedPreceding, -1)
      race.select(col("レースID"), col("date"), col("選手登番"),
          col("順位"), col("展示"))
        .withColumn("prior_starts", count(lit(1)).over(w))
        // sum over the empty first-race frame is NULL (count is 0) —
        // a debut player has 0 prior wins, not unknown
        .withColumn("prior_wins",
          coalesce(sum(when(col("順位") === 1, 1).otherwise(0)).over(w),
            lit(0L)))
        .withColumn("prior_win_rate",
          when(col("prior_starts") > 0,
            col("prior_wins").cast("double") / col("prior_starts")))
        .withColumn("prior_avg_exhibition", round(avg("展示").over(w), 4))
        .orderBy("レースID", "選手登番")
    },

    // The sport's best-known structural stat — lane (course) bias:
    // win rate by starting lane. Lane 1 holds the inside line and wins
    // a plurality of races; the spec pins that ordering, which also
    // functions as an end-to-end sanity check that ranks/lanes
    // survived parsing intact.
    QueryDef.noOracle("boatrace_lane_bias") { (s, _) =>
      val (env, result, _, schedule) = tables(s)
      val race = BoatracePipeline.typedRace(
        BoatracePipeline.raceTable(env, result, schedule))
      race.groupBy("艇番")
        .agg(count(lit(1)).as("starts"),
          sum(when(col("順位") === 1, 1L).otherwise(0L)).as("wins"),
          round(avg(when(col("順位") === 1, 1.0).otherwise(0.0)), 4)
            .as("win_rate"))
        .orderBy("艇番")
    },

    // The reference's downstream workload (README.md:23-44) is a
    // betting simulation over the race table + odds — its model is
    // LightGBM (out of scope), so this runs the strongest
    // non-learned predictor instead: bet the boat with the best
    // national win rate (全国勝率). Per-race argmax via row_number,
    // then one broadcast join against the odds payouts; 単勝 (win-bet)
    // accuracy and ROI come out as one metrics row. The reference's
    // trained model reports 0.653 accuracy / 114% ROI — this
    // feature-only baseline lands near 0.5 / <100%, the gap the model
    // earns.
    QueryDef.noOracle("boatrace_betting_sim") { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val (env, result, odds, schedule) = tables(s)
      val race = BoatracePipeline.typedRace(
        BoatracePipeline.raceTable(env, result, schedule))
      val w = Window.partitionBy("レースID")
        .orderBy(col("全国勝率").desc, col("艇番"))
      val bets = race
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("レースID"), col("艇番").as("bet_boat"),
          (col("順位") === 1).as("hit"))
      bets
        // odds is race-cardinality (a fact, not a dim) — no broadcast
        // hint; the join shuffles on レースID like the race table build
        .join(odds.select(col("レースID"),
          col("単勝").cast("int").as("win_payout")), Seq("レースID"))
        // 不成立/void payouts are -1 sentinels (SURVEY §2.3): no payout
        .agg(count(lit(1)).as("n_races"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"),
          round(avg(when(col("hit"), 1.0).otherwise(0.0)), 4).as("accuracy"),
          round(sum(when(col("hit") && col("win_payout") > 0,
              col("win_payout").cast("long")).otherwise(0L))
            .cast("double") / (count(lit(1)) * 100), 4).as("roi"))
    },

    // R5: the reference's `レースID LIKE '2020-08-28%'` (read_db.py:19)
    // through the DSv2 connector — the prefix predicate reaches
    // SupportsPushDownFilters and prunes FILES at planning time, so a
    // one-date query decodes 2 of the 62 corpus files instead of
    // parsing everything and filtering after (the file-granularity
    // form of partition pruning; the warehouse layout's date
    // partitions give the same property post-ETL).
    QueryDef.noOracle("boatrace_date_query") { (s, _) =>
      def t(name: String) = s.read.format("boatrace")
        .option("table", name).load(txtDir)
        .filter(col("レースID").startsWith("2020-08-28"))
      BoatracePipeline.typedRace(
        BoatracePipeline.raceTable(t("env"), t("result"), t("schedule")))
        .filter(col("date") === lit("2020-08-28").cast("date"))
        .select("レースID", "順位", "選手登番", "艇番", "展示")
        .orderBy("レースID", "順位")
    },
  )
}
