package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed silver record (SURVEY.md §1.1: `Dataset[EvSession]` where
  * compile-time field checks help — downstream feature code gets
  * field access instead of stringly-typed columns; the Encoder is
  * Catalyst-native so there's no serialization penalty until a
  * closure actually needs objects).
  */
final case class EvSession(
    sessionId: String,
    userId: String,
    stationId: String,
    locationId: String,
    kwhTotal: Option[Double],
    dollars: Option[Double],
    distance: Option[Double],
    chargeTimeHrs: Option[Double],
    facilityType: String,
    platform: String,
    weekday: String,
    created: Timestamp,
    ended: Timestamp,
    event_date: Date,
    managerVehicle: Option[Int])

object EvSession {
  /** Typed view of a clean silver frame. */
  def typed(silverGood: DataFrame): Dataset[EvSession] = {
    val spark = silverGood.sparkSession
    import spark.implicits._
    silverGood.select("sessionId", "userId", "stationId", "locationId",
      "kwhTotal", "dollars", "distance", "chargeTimeHrs", "facilityType",
      "platform", "weekday", "created", "ended", "event_date", "managerVehicle")
      .as[EvSession]
  }
}
